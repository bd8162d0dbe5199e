"""Dictionary-zstd tier pins: formatted (entropy tables + repeat
offsets + content prefix) and raw-content dictionaries decode frames
the reference CLI produced; undeclared/unknown dictionaries flag
honestly; a CLI-gated sweep re-trains and re-validates live."""
import base64
import hashlib
import shutil
import subprocess
import zlib

import pytest

_ZSTD = shutil.which("zstd")

# trained by the reference CLI (zstd --train over 60 synthetic docs),
# zlib+base64 for compactness; two level-19 frames pinned against the
# sha256 of their plaintexts
DICT_B64 = (
    "eNqNWL2OHEUQHjAIJ5YgQwKjDSwRsr+3d5LpxA7IHJiAxEHvzmh2xd7e7GnOEk/A"
    "AxAgEgLkB7CIsWQJybFDPwDOiBEhO13VXfVV9wIne25vtuu/6uuve/ls/OdPH7x4"
    "9PmHLy/vzMa3wr/2/b/Hvz/6qvmt/vWHv75589b/+P2Tz55+9+btR588rqpP792b"
    "/vz69tdPq+q96mX1bvXgeXXn7pOHvzz7+PGr6lalf/64W5mfd6pBrKpuH/+7+/XV"
    "erStv5wv3eFmu/622/hRf+23++2+HbX+8tKPVk3v+SM911f7vtn3o37TjOrGj/xu"
    "kOq2XbPb7hu1/v4XR+3JxHThBgm/i/J1s+uVXLCPIosLF5wZrKZ1ZG5QVZCYTh27"
    "z1+zzyREn2vfYxDBLQoZfQuhhIeJcZDoWBMFNXxNz2E9OjWfceQkoBIa/g62TBgT"
    "x36bnEvwOgCKNCg7NMrr8EjllFcpykGiLRVrMQ55HNTGDCU95ANliCyLVyv9OkkU"
    "CjWZOPJuIzlJ6YyCKDKbkkiX1prHURQlzhw7ojxOTqUP9n0oVVCY6g0toxqC1QeX"
    "hycVC1QV2uHckeJgl2pA3RBeFKoxWXJXx/aDxJIvJlcTR+5KDGqape0gDspubHCj"
    "kPUdjcIUSM/neaHQjrIzR8bq1MFc+0Y+DIuNyUHs0iJLKreZmKXTM84dmUosPRYc"
    "gQHwKZj42pSRolExdfkrlVKSNr2jO6yzdcRQaPR0hxLS7lSmbFlDKQgPIGYFM5QS"
    "iHwVl4nyk+h9RojUWhw42YKM3duUIp1hVQtyUSbpuDaFK8HFeM1gXBAkGNdZWzQW"
    "f4uN9ZWdetW8ejDEgRXpgOYnxKUmgL6ieVAIGL84EcY5T1ccUNwUYXtBjzspxL+b"
    "mHGm6kY6ShoEla4NAzgNyYs5F7kAq2XwY9hvvajHSdE10Huc36mOMPNsnDpn2F/l"
    "UC/NLi2vwK/XuxYBehoAVtom0DvNk9Be5/Xg1oL6eXamM54yTIxiMmYrOeOqAuQq"
    "T2C7h95tjfuqx4yNsePCJCjMdocJ+43J66+hrUxQdjppAgsoWQInQZR2Y8c9EpYC"
    "BaKB1Zu52RUxrNhInSCHUJ2ciqkS9GrmRbhQwdk5Z+4grWiZltchKAfKMzlhpNbx"
    "c0YOcZrz6I0O4urDsnwL1RALxIj+QFxVw3WSyTZ5h/IL49WYCeA2a55Ub70p6cQz"
    "oVUpzBAfxmPVmAOHWVPA+1atVn5hDHzO4nSq1GYnFOkxxTI3bUY3wIc8u7VBVlU9"
    "M+eRkV8DX/pfnDwDWjxHZSeu1p/A7sncSdx4xMlYE/MCfcxDTm9c5e453MR9YuKS"
    "Tqi97h7qEv7NaICwDPYTPds02R77H+eDVDF7uoPCKq/qUt/CSY2chr0KybSh8sga"
    "NevIsYx0F/JRJCtC9WGDUMSu1Cp8olVzjrTXFHgZe0e1rnwyjBluMXwslSyHsQJH"
    "CVdNgCUSA9ldX8EknwASiLw3TDMDk/nUQT4PN9pp1SoK69Q2E2g2mDTDOHUFiKlT"
    "je0lSeFMQjaQ41w4iNKAHSUHTjKwsReoaRgs4BTmrCN+KuhfA7yrjJlbBUVbCrx6"
    "4TI3tUJxFP1OIWWnNRg0VUKoAeyTMH1ClhAFAEj0t5gk9EdIK+TK1jmTCdUsHAlO"
    "n2OGh8q+sWNuAFKIGWDoexS7YQcsgYvM7FSKOEFpguzmexCYp69TI2kYNTwUsc7b"
    "qxSdKI2q6cCZQT9kU1/CpaJn1Sjc2IKxvElzno24lfMl5K5akqzba1A1dwIHcL7K"
    "AE7ATE+AwMMBgFa0monU1Nvueub86DWvJjmonswOoKfmX93Wl+4dy0POSfoHJ1Sg"
    "WA=="
)
FRAME_00 = (
    'KLUv/WeZB71PBAJVAwAIPC78Dg6hy88WXSOckJt850zc0AUzvHd4p/R/TkSuJkWo'
    'YTg4oOc/lWCigfdyaklVUcKqpCkfcuPpCc6lNwST7WhZ4lmPmRrZtuoytbuR9EWO'
    'tIRusxrUm97xw5vB8ujoADGjjEgq0f8BKf6oTQ=='
)
WANT_00_SHA = (
    '5632262e11f9c0249160d6d40dcbdabf5b4b3fb4ed4b40a3b7d3691dbff4b4e0'
)
FRAME_23 = (
    'KLUv/WeZB71P7AFNAwAIPC/89g2V0ok2/Bcr/a4LhXPNtkgccxLGlirQyEt5rvmi'
    'S2eNroNI6lyU/AAz8chHfzYneFk6eEveapSqngQXc1P4SLMiAuQW9bkTyycLBT5t'
    'Hg7dISOENKkMzkTUQT/7bBkdFFeC+x++bkLB'
)
WANT_23_SHA = (
    'dcde51562455f6f7229cf5b021a33dce3f7e0a3fe39937d76bc4e87c777a1755'
)


def _w():
    from dwc_dataframe_validator_spark.sources import warc
    return warc


def _dict_blob():
    return zlib.decompress(base64.b64decode(DICT_B64))


def test_pinned_dictionary_frames():
    W = _w()
    d = _dict_blob()
    parsed = W._zstd_parse_dictionary(d)
    assert parsed is not None and parsed["id"] is not None
    assert parsed["huff"] is not None and len(parsed["rep"]) == 3
    for frame_b64, want_sha in (
        (FRAME_00, WANT_00_SHA), (FRAME_23, WANT_23_SHA),
    ):
        enc = base64.b64decode(frame_b64)
        got = W.zstd_decompress(enc, d)
        assert got is not None
        assert hashlib.sha256(got).hexdigest() == want_sha
        # without the declared dictionary: honest None, not soup
        assert W.zstd_decompress(enc) is None
        assert W._zstd_decode_pure(enc) is None
        # with a WRONG dictionary id: honest None
        wrong = bytearray(d)
        wrong[4] ^= 0xFF
        assert W.zstd_decompress(enc, bytes(wrong)) is None


def test_dictionary_parse_refusals():
    W = _w()
    d = _dict_blob()
    # torn entropy tables flag
    assert W._zstd_parse_dictionary(d[:40]) is None
    # a magic-less blob is a raw-content dictionary, not an error
    raw = W._zstd_parse_dictionary(b"just some window prefix bytes")
    assert raw["id"] is None and raw["huff"] is None
    # rep offsets pointing outside the content flag
    bad = bytearray(d)
    # find the rep-offset area by re-parsing: corrupt the tail 12
    # bytes ahead of content via a huge offset
    parsed = W._zstd_parse_dictionary(d)
    cpos = len(d) - len(parsed["content"]) - 12
    bad[cpos:cpos + 4] = (1 << 30).to_bytes(4, "little")
    assert W._zstd_parse_dictionary(bytes(bad)) is None


@pytest.mark.skipif(_ZSTD is None, reason="zstd CLI not present")
def test_cli_dictionary_sweep(tmp_path):
    """Live re-validation: train a dictionary with the reference
    CLI, compress at several levels with formatted AND raw-content
    dictionaries, decode with the pure tier byte-identically."""
    import random

    W = _w()
    rng = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "content",
             "training", "pipeline", "the", "quick", "data"]
    samples = []
    for i in range(60):
        txt = " ".join(
            rng.choice(words)
            for _ in range(rng.randrange(50, 200))
        )
        p = tmp_path / ("s%02d.txt" % i)
        p.write_text("<doc id=%d>%s</doc>" % (i, txt))
        samples.append(p)
    dpath = tmp_path / "d.zdict"
    subprocess.run(
        ["zstd", "--train", *map(str, samples), "-o", str(dpath),
         "-f", "-q"],
        check=True, capture_output=True,
    )
    fmt_dict = dpath.read_bytes()
    raw_dict = samples[0].read_bytes()[:2000]
    rpath = tmp_path / "raw.dict"
    rpath.write_bytes(raw_dict)
    for dict_path, blob in ((dpath, fmt_dict), (rpath, raw_dict)):
        for lvl in (1, 5, 19):
            for s in (samples[3], samples[41]):
                out = tmp_path / "f.zst"
                subprocess.run(
                    ["zstd", "-q", "-f", "-D", str(dict_path),
                     str(s), "-o", str(out), "-%d" % lvl],
                    check=True, capture_output=True,
                )
                got = W.zstd_decompress(out.read_bytes(), blob)
                assert got == s.read_bytes(), (dict_path, lvl, s)
