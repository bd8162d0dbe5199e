"""Derive the RFC 7932 data tables from the reference codec.

The brotli static dictionary, the 121 word transforms and the
literal-context lookup tables are public data (RFC 7932 appendices),
but transcribing them by hand is error-prone.  This tool derives
them MECHANICALLY from the canonical implementation (Node.js zlib's
bundled brotli) by crafting streams whose decoded output reveals
each entry:

- dictionary: per word length, a stream of out-of-window copies —
  the decoded output IS the word list;
- transforms: a known word referenced under every transform id; the
  output reveals prefix/kind/suffix (classified against candidate
  ferment/omit kinds over three probe words);
- context LUTs: two zero-bit literal trees ('A'/'B') with a context
  map selecting tree by bit j of the context id; copies replay every
  (p1, p2) pair before a probe literal, so the A/B string is bit j
  of ctx(p1, p2) for all 65536 pairs (6 streams per mode).

Writes functions/brotli_data.py and brotli_dictionary.bin.zlib.
Requires node; re-run only to regenerate (pytest re-validates the
committed tables against node when present).
"""
import base64
import json
import os
import subprocess
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dwc_dataframe_validator_spark.functions import brotli as B  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "dwc_dataframe_validator_spark",
                       "functions")


def node_batch(streams):
    """Decode many brotli streams in one node process →
    list of bytes-or-None."""
    payload = json.dumps([base64.b64encode(s).decode() for s in streams])
    js = """
const z = require('zlib');
const chunks = [];
process.stdin.on('data', c => chunks.push(c));
process.stdin.on('end', () => {
  const items = JSON.parse(Buffer.concat(chunks).toString());
  const out = items.map(b64 => {
    try {
      return z.brotliDecompressSync(Buffer.from(b64, 'base64'))
              .toString('base64');
    } catch (e) { return null; }
  });
  process.stdout.write(JSON.stringify(out));
});
"""
    r = subprocess.run(["node", "-e", js], input=payload.encode(),
                       capture_output=True)
    assert r.returncode == 0, r.stderr[:500]
    return [
        None if x is None else base64.b64decode(x)
        for x in json.loads(r.stdout)
    ]


def dict_ref_stream(word_ids, copy_len, mlen=None):
    """One metablock of out-of-window copies: word k of ``copy_len``
    under transform-carrying ids ``word_ids`` (the caller bakes the
    transform id into the word id)."""
    w = B._Writer(24)
    if mlen is None:
        mlen = copy_len * len(word_ids)
    w.meta_header(mlen, islast=True)
    B._meta_common_header(w)
    w.simple_code(256, [65])  # literal tree: never used
    cc, ce, cex = B._len_code(B._COPY_LEN, copy_len)
    sym = B._ins_copy_sym(0, cc, implicit0=False)
    w.simple_code(704, [sym])
    # distances depend on output position (max_dist == outlen here)
    dsyms = set()
    outlen = 0
    plan = []
    for wid in word_ids:
        d = outlen + 1 + wid
        ds, nb, ex = B._dist_sym(d)
        dsyms.add(ds)
        plan.append((ds, nb, ex))
        outlen += copy_len  # transform 0 only; callers with other
        # transforms must pass a single word_id (outlen unused after)
    dcodes = B._emit_simple_or_complex(w, 64, dsyms)
    for ds, nb, ex in plan:
        w.put(cex, ce)  # copy extra (constant per stream)
        c, n = dcodes[ds]
        w.put(c, n)
        w.put(ex, nb)
    return w.getvalue()


def extract_dictionary():
    print("extracting static dictionary ...")
    parts = []
    for L, bits in zip(range(B._DICT_MIN, B._DICT_MAX + 1),
                       B._DICT_BITS):
        n = 1 << bits
        # chunk to keep distances small and streams modest
        blobs = []
        CH = 2048
        streams = [
            dict_ref_stream(list(range(k, min(k + CH, n))), L)
            for k in range(0, n, CH)
        ]
        for got in node_batch(streams):
            assert got is not None, (L, "node refused")
            blobs.append(got)
        part = b"".join(blobs)
        assert len(part) == L << bits, (L, len(part))
        parts.append(part)
    d = b"".join(parts)
    print("dictionary bytes:", len(d))
    return d


def transform_probe_stream(wid, copy_len, mlen):
    """One dict reference under ``wid``, MLEN = guess.  The
    distance alphabet includes distance 1 as its ZERO-BITS-FIRST
    symbol, so if the metablock is under-filled the zero padding
    decodes as an in-window distance-1 LZ copy — which node refuses
    when it overruns MLEN (dictionary copies truncate, LZ copies
    don't).  Successes are exactly MLEN ≤ len(T(word)) plus isolated
    MLEN = len + k*copy_len flukes; the caller takes the contiguous
    prefix."""
    w = B._Writer(24)
    w.meta_header(mlen, islast=True)
    B._meta_common_header(w)
    w.simple_code(256, [65])  # literal tree: never used
    cc, ce, cex = B._len_code(B._COPY_LEN, copy_len)
    sym_a = B._ins_copy_sym(0, cc, implicit0=False)
    w.simple_code(704, [sym_a])
    ds1 = B._dist_sym(wid + 1)
    ds2 = B._dist_sym(1)
    assert ds2[0] <= ds1[0]  # zero bits must decode to distance 1
    dc = B._emit_simple_or_complex(w, 64, {ds1[0], ds2[0]})
    w.put(cex, ce)
    c, n = dc[ds1[0]]
    w.put(c, n)
    w.put(ds1[2], ds1[1])
    return w.getvalue()


def extract_transforms(dictionary):
    print("extracting transforms ...")
    # probe words: length-12 entries with alphabetic content
    L = 12
    bits = B._DICT_BITS[L - B._DICT_MIN]
    base = B._DICT_OFFSETS[L - B._DICT_MIN]
    probe_idx = []
    for i in range(1 << bits):
        wbytes = dictionary[base + i * L: base + (i + 1) * L]
        if sum(97 <= c <= 122 for c in wbytes) >= 8:
            probe_idx.append(i)
        if len(probe_idx) == 3:
            break
    assert len(probe_idx) == 3
    words = [
        dictionary[base + i * L: base + (i + 1) * L]
        for i in probe_idx
    ]
    print("probe words:", words)
    # M-search per (tid, word): true length = the contiguous prefix
    # of successful MLEN guesses (see transform_probe_stream)
    cands = []
    keys = []
    MRange = range(1, L + 21)
    for tid in range(121):
        for wi, idx in enumerate(probe_idx):
            wid = (tid << bits) | idx
            for M in MRange:
                keys.append((tid, wi, M))
                cands.append(transform_probe_stream(wid, L, M))
    results = node_batch(cands)
    ok_m = {}
    outs = {}
    for (tid, wi, M), res in zip(keys, results):
        if res is not None:
            ok_m.setdefault((tid, wi), set()).add(M)
            outs[(tid, wi, M)] = res
    got = {}
    for tid in range(121):
        for wi in range(3):
            ms = sorted(ok_m.get((tid, wi), set()))
            # the smallest success is the true length; larger ones
            # are the predicted len + k*copy_len junk-fill flukes
            assert ms, (tid, wi)
            assert all((m - ms[0]) % L == 0 for m in ms[1:]), (
                tid, wi, ms,
            )
            got[(tid, wi)] = outs[(tid, wi, ms[0])]
    assert len(got) == 121 * 3, (len(got), "missing transforms")

    def ferment(buf, i):
        c = buf[i]
        if c < 192:
            if 97 <= c <= 122:
                buf[i] ^= 32
            return 1
        if c < 224:
            if i + 1 < len(buf):
                buf[i + 1] ^= 32
            return 2
        if i + 2 < len(buf):
            buf[i + 2] ^= 5
        return 3

    def apply_kind(word, kind, arg):
        wb = bytearray(word)
        if kind == "omit_first":
            return bytes(wb[min(arg, len(wb)):])
        if kind == "omit_last":
            return bytes(wb[: max(0, len(wb) - arg)])
        if kind == "ferment_first":
            if wb:
                ferment(wb, 0)
            return bytes(wb)
        if kind == "ferment_all":
            i = 0
            while i < len(wb):
                i += ferment(wb, i)
            return bytes(wb)
        return bytes(wb)

    kinds = (
        [("identity", 0), ("ferment_first", 0), ("ferment_all", 0)]
        + [("omit_first", k) for k in range(1, 10)]
        + [("omit_last", k) for k in range(1, 10)]
    )
    transforms = []
    for tid in range(121):
        matches = []
        for kind, arg in kinds:
            cores = [apply_kind(wd, kind, arg) for wd in words]
            outs = [got[(tid, wi)] for wi in range(3)]
            # find consistent prefix/suffix across all three
            o0, c0 = outs[0], cores[0]
            okset = []
            for p in range(len(o0) - len(c0) + 1):
                if o0[p:p + len(c0)] == c0:
                    pre, suf = o0[:p], o0[p + len(c0):]
                    if all(
                        outs[w] == pre + cores[w] + suf
                        for w in range(3)
                    ):
                        okset.append((pre, suf))
            for pre, suf in okset:
                matches.append((pre, kind, arg, suf))
        # dedup identical reconstructions (e.g. identity vs omit_0)
        uniq = sorted(set(matches), key=lambda m: (
            len(m[0]) + len(m[3]), m[1] != "identity", m,
        ))
        assert uniq, ("no kind matches transform", tid)
        transforms.append(uniq[0])
    ids = [t for t in transforms if t[1] == "identity"
           and not t[0] and not t[3]]
    assert len(ids) == 1, "exactly one pure-identity transform"
    return transforms


def ctx_probe_stream(mode, bit_j):
    """Two-tree bit-slice probe: returns (stream, npairs, mb1_len)."""
    pairs = [(p2, p1) for p2 in range(256) for p1 in range(256)]
    mb1 = bytes(b for pr in pairs for b in pr)
    npairs = len(pairs)
    w = B._Writer(24)
    w.uncompressed_metablock(mb1)
    mlen = 3 * npairs + 1
    w.meta_header(mlen, islast=True)
    for _ in range(3):
        w.bit(0)  # NBLTYPES = 1 each
    w.put(0, 2)  # NPOSTFIX
    w.put(0, 4)  # NDIRECT
    w.put(mode, 2)  # context mode under probe
    # NTREESL = 2
    w.bit(1)
    w.put(0, 3)
    # context map: RLEMAX off, simple 2-symbol code, 64 raw entries
    w.bit(0)
    w.simple_code(2, [0, 1])
    cmap_codes = B._simple_code_table([0, 1])
    for ctx in range(64):
        c, n = cmap_codes[(ctx >> bit_j) & 1]
        w.put(c, n)
    w.bit(0)  # no IMTF
    w.bit(0)  # NTREESD = 1
    w.simple_code(256, [65])  # tree 0 → 'A'
    w.simple_code(256, [66])  # tree 1 → 'B'
    sym = B._ins_copy_sym(1, 0, implicit0=False)  # insert 1, copy 2
    w.simple_code(704, [sym])
    dsyms = set()
    plan = []
    for k in range(npairs):
        d = len(mb1) + k + 1
        ds, nb, ex = B._dist_sym(d)
        dsyms.add(ds)
        plan.append((ds, nb, ex))
    dcodes = B._emit_simple_or_complex(w, 64, dsyms)
    for ds, nb, ex in plan:
        c, n = dcodes[ds]
        w.put(c, n)
        w.put(ex, nb)
    # final probe command: insert 1, copy suppressed by MLEN
    return w.getvalue(), npairs, len(mb1)


def extract_context_luts():
    print("extracting context LUTs ...")
    tables = {}
    for mode in range(4):
        streams = [ctx_probe_stream(mode, j) for j in range(6)]
        outs = node_batch([s for s, _n, _m in streams])
        npairs = streams[0][1]
        mb1len = streams[0][2]
        ctx = [[0] * 256 for _ in range(256)]  # [p2][p1]
        for j, out in enumerate(outs):
            assert out is not None, (mode, j)
            body = out[mb1len:]
            assert len(body) == 3 * npairs + 1
            for k in range(1, npairs + 1):
                probe = body[3 * k] if k < npairs else body[-1]
                bitv = 1 if probe == 66 else 0
                p2, p1 = (k - 1) >> 8, (k - 1) & 255
                ctx[p2][p1] |= bitv << j
        tables[mode] = ctx
    # sanity: modes 0/1 follow the trivial formulas
    for p1 in range(256):
        for p2 in (0, 77, 255):
            assert tables[0][p2][p1] == (p1 & 0x3F)
            assert tables[1][p2][p1] == (p1 >> 2)
    # factor mode 2 (UTF8): ctx = P1LUT[p1] | P2LUT[p2] (bitwise OR
    # — the tables overlap in the low bits for non-ASCII p1)
    assert tables[2][0][0] == 0
    utf_p2 = [tables[2][p2][0] for p2 in range(256)]
    utf_p1 = [tables[2][0][p1] for p1 in range(256)]
    for p1 in range(256):
        for p2 in range(256):
            want = utf_p1[p1] | utf_p2[p2]
            got = tables[2][p2][p1]
            assert got == want, ("utf8 not separable", p1, p2,
                                 got, want)
    # factor mode 3 (signed): ctx = (LUT[p1] << 3) | LUT2[p2]
    sg_p1 = [tables[3][0][p1] >> 3 for p1 in range(256)]
    sg_p2 = [tables[3][p2][0] & 7 for p2 in range(256)]
    for p1 in range(256):
        for p2 in range(256):
            want = (sg_p1[p1] << 3) | sg_p2[p2]
            assert tables[3][p2][p1] == want, ("signed", p1, p2)
    return utf_p1, utf_p2, sg_p1, sg_p2


def main():
    d = extract_dictionary()
    transforms = extract_transforms(d)
    utf_p1, utf_p2, sg_p1, sg_p2 = extract_context_luts()
    dict_path = os.path.join(OUT_DIR, "brotli_dictionary.bin.zlib")
    with open(dict_path, "wb") as f:
        f.write(zlib.compress(d, 9))
    print("wrote", dict_path)

    def fmt_list(name, vals):
        body = ", ".join(str(v) for v in vals)
        lines = []
        cur = "    "
        for tok in body.split(" "):
            if len(cur) + len(tok) > 70:
                lines.append(cur.rstrip())
                cur = "    "
            cur += tok + " "
        lines.append(cur.rstrip())
        return "%s = [\n%s\n]" % (name, "\n".join(lines))

    tf_lines = ["TRANSFORMS = ["]
    for pre, kind, arg, suf in transforms:
        tf_lines.append("    (%r, %r, %d, %r)," % (pre, kind, arg, suf))
    tf_lines.append("]")
    py = '''"""RFC 7932 data tables: literal-context LUTs, the 121 word
transforms, and the 122,784-byte static dictionary.

All of this is PUBLIC data (RFC 7932 appendices A and B).  The
copies here were derived mechanically from the canonical reference
implementation (Node.js zlib's bundled brotli) by
``tools/derive_brotli_tables.py``: crafted streams whose decoded
output reveals each table entry — context LUTs via two-tree
bit-slice probes, transforms via probe words under every transform
id, the dictionary via out-of-window copy references.  pytest
re-verifies every table against node whenever node is present.

Generated file — regenerate with the tool, do not hand-edit the
arrays.
"""
import os
import zlib

_HERE = os.path.dirname(__file__)

%s

%s

%s

%s

%s

_DICT_CACHE = None


def dictionary() -> bytes:
    """The static dictionary bytes (zlib-stored sidecar)."""
    global _DICT_CACHE
    if _DICT_CACHE is None:
        path = os.path.join(_HERE, "brotli_dictionary.bin.zlib")
        with open(path, "rb") as f:
            _DICT_CACHE = zlib.decompress(f.read())
    return _DICT_CACHE
''' % (
        fmt_list("CTX_UTF8_P1", utf_p1),
        fmt_list("CTX_UTF8_P2", utf_p2),
        fmt_list("CTX_SIGNED", sg_p1),
        fmt_list("CTX_SIGNED_P2", sg_p2),
        "\n".join(tf_lines),
    )
    data_path = os.path.join(OUT_DIR, "brotli_data.py")
    with open(data_path, "w") as f:
        f.write(py)
    print("wrote", data_path)


if __name__ == "__main__":
    main()
