// Reference-codec shim for validation: reads raw bytes on stdin,
// writes brotli-compressed (mode=c) or -decompressed (mode=d) bytes
// on stdout.  argv: mode [quality] [lgwin]
const z = require('zlib');
const chunks = [];
process.stdin.on('data', (c) => chunks.push(c));
process.stdin.on('end', () => {
  const data = Buffer.concat(chunks);
  const mode = process.argv[2] || 'c';
  if (mode === 'd') {
    try {
      process.stdout.write(z.brotliDecompressSync(data));
    } catch (e) {
      process.stderr.write(String(e));
      process.exit(3);
    }
    return;
  }
  const q = parseInt(process.argv[3] || '11', 10);
  const w = parseInt(process.argv[4] || '22', 10);
  const sizeHint = parseInt(process.argv[5] || String(data.length), 10);
  process.stdout.write(z.brotliCompressSync(data, {params: {
    [z.constants.BROTLI_PARAM_QUALITY]: q,
    [z.constants.BROTLI_PARAM_LGWIN]: w,
    [z.constants.BROTLI_PARAM_SIZE_HINT]: sizeHint,
  }}));
});
