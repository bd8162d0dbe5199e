"""Regenerate the repo-shipped BPE merges file from the seed corpus
below: ``python tools/gen_bpe_vocab.py``.

The seed text is ordinary English prose written for this repo — enough
to learn the common English pair statistics (th, he, in, er, an, ...)
that make the tokenizer behave like a real subword vocabulary on the
driver's synthetic documents, while keeping the file reviewable."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dwc_dataframe_validator_spark.functions.bpe import (  # noqa: E402
    DEFAULT_MERGES_PATH,
    save_merges,
    train_bpe,
)

SEED_TEXT = """
the quick brown fox jumps over the lazy dog while the patient heron
waits in the shallow water for the small fish that swim there every
morning and every evening when the light is low and the wind is still
a data pipeline reads records from storage checks each value against
the rules and writes the clean rows to the output table with the
errors kept in a separate place for later review by the people who
maintain the system and want to understand what went wrong and when
the weather station records the temperature the pressure and the wind
speed every minute of every day and the numbers are checked for range
errors missing values and duplicate readings before they are stored
in the long term archive where researchers can read them for years
the children walked to the school along the river road past the old
stone bridge and the water mill that still turns slowly in the stream
counting tokens in text requires splitting the string into words and
then into smaller pieces that appear often enough in the language to
deserve their own entry in the vocabulary of the tokenizer itself
"""


def main() -> None:
    merges = train_bpe([SEED_TEXT], n_merges=300)
    save_merges(merges, DEFAULT_MERGES_PATH)
    print(f"wrote {len(merges)} merges to {DEFAULT_MERGES_PATH}")


if __name__ == "__main__":
    main()
