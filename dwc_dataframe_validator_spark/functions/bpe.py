"""Byte-pair-encoding tokenizer: trainer + greedy encoder.

The classic BPE algorithm (Sennrich et al. 2016; the GPT-2 tokenizer
uses the same greedy lowest-rank merge loop): pre-tokenize, then
repeatedly merge the adjacent symbol pair with the best (lowest) rank
until no ranked pair remains.

This is the CPU-side core.  The Spark surface is
``operators.text.token_stats_bpe`` — an Arrow-batched ``mapInPandas``
that broadcasts the merge table and encodes each batch in one Python
pass (never a row-at-a-time Python UDF).  The engine-independent
``BPE_ISH_PATTERN`` count stays the DuckDB-oracle column; this real
tokenizer is deterministic given a merges file but not SQL-expressible,
so its query is rows-only checked and pytest-pinned.

The repo ships a small merges vocabulary (``data/bpe_merges.txt``)
trained by ``train_bpe`` on the seed text in
``tools/gen_bpe_vocab.py`` — regenerate with
``python tools/gen_bpe_vocab.py``.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from typing import Iterable

# Same pre-tokenization shape as operators.text.BPE_ISH_PATTERN:
# letter runs, single digits, single non-space symbols.  Lowercase at
# encode time keeps the shipped vocabulary small.
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")

DEFAULT_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "bpe_merges.txt",
)

# end-of-word marker — distinguishes "er" inside "water" from "er</w>"
# ending "water", the standard Sennrich trick
EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text.lower())


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(texts: Iterable[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a corpus.  Deterministic:
    ties in pair frequency break lexicographically."""
    words = Counter()
    for t in texts:
        words.update(pretokenize(t))
    return train_bpe_from_counts(words, n_merges)


def train_bpe_from_counts(
    word_counts: dict, n_merges: int = 200
) -> list[tuple[str, str]]:
    """The merge loop itself, from an aggregated ``{word: count}``
    table.  This is the contract the DISTRIBUTED trainer
    (operators/text.py ``learn_bpe_merges``) feeds: BPE training only
    ever needs word counts, so the corpus pass is a Spark aggregate
    and this sequential loop runs over the (vocab-bounded) count
    table — the same architecture real tokenizer trainers use.
    Deterministic: ties in pair frequency break lexicographically,
    so a Spark-aggregated count table and a driver-side Counter
    produce IDENTICAL merges (pytest-pinned equivalence)."""
    seqs: dict[tuple[str, ...], int] = {
        _word_symbols(w): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, cnt in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, cnt in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + cnt
        seqs = new_seqs
    return merges


def load_merges(path: str = DEFAULT_MERGES_PATH) -> dict[tuple[str, str], int]:
    """Merges file → {pair: rank}; line format ``left<TAB>right``,
    ``#`` comments skipped, rank = line order."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split("\t")
            ranks[(a, b)] = len(ranks)
    return ranks


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# BPE merge rules (rank = line order).\n")
        fh.write("# Regenerate: python tools/gen_bpe_vocab.py\n")
        for a, b in merges:
            fh.write(f"{a}\t{b}\n")


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the adjacent pair with the lowest
    rank (GPT-2's loop) until no ranked pair remains."""
    parts = list(_word_symbols(word))
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (parts[best_i], parts[best_i + 1])
        merged = pair[0] + pair[1]
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and (parts[i], parts[i + 1]) == pair:
                out.append(merged)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def encode(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    tokens: list[str] = []
    for w in pretokenize(text):
        tokens.extend(encode_word(w, ranks))
    return tokens


def token_count(text: str, ranks: dict[tuple[str, str], int]) -> int:
    return sum(len(encode_word(w, ranks)) for w in pretokenize(text))
