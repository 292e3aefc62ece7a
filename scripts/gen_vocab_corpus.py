"""Vocabulary-rich synthetic corpus for BPE-family measurements
(VERDICT r9 task 3 / r10 task 4 / r11 task 3).

The driver's `documents` fixture has a 31-word vocabulary, so BPE exhausts
(every word a single symbol) at ~113 merges — the batched-BPE divergence
table in SCALING.md was stuck at a 64-merge floor for three rounds.  This
generator materializes a SEPARATE fixture with a few thousand word types so
the trainer has ≥1k merges of headroom; the driver fixtures and every
committed oracle are untouched (output lives under /tmp).

Construction (fully seeded — a fixed numpy PCG64 stream; regenerating is
byte-identical):

- VOCABULARY: ``--word-types`` (default 4000) distinct words, each 2-5
  syllables drawn from a 160-syllable CV/CVC inventory.  Syllable reuse is
  the point: words share subword structure, so pair statistics stay rich
  deep into training — the property real text has and the 31-word fixture
  lacks.  Duplicate composites are suffix-disambiguated so the type count
  is exact.
- FREQUENCIES: Zipf with exponent ``--zipf-s`` (default 1.1) over the rank
  order, the standard natural-language shape: a heavy head (function-word
  stand-ins) and a long tail of rare types, which is what stresses the
  batched trainer's disjointness heuristic late in training.
- DOCUMENTS: ``--docs`` (default 5000) docs of Normal(120, 40)-length word
  sequences (floor 10), lang/source round-robined like the driver fixture.

Usage: python scripts/gen_vocab_corpus.py [--out /tmp/bpe_vocab_corpus]
Idempotent: skips generation when <out>/_DONE exists (delete to force).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CONSONANTS = list("bcdfghjklmnprstvz")
VOWELS = list("aeiou")


def build_vocab(n_types: int, rng: np.random.Generator) -> list[str]:
    syllables = []
    for c in CONSONANTS:
        for v in VOWELS:
            syllables.append(c + v)
    for c in CONSONANTS[:12]:
        for v in VOWELS[:5]:
            syllables.append(c + v + "n")
    # deterministic shuffle so syllable rank is uncorrelated with word rank
    order = rng.permutation(len(syllables))
    syllables = [syllables[i] for i in order]
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < n_types:
        k = int(rng.integers(2, 6))  # 2-5 syllables
        w = "".join(syllables[int(i)] for i in rng.integers(0, len(syllables), k))
        if w in seen:
            w = w + syllables[len(vocab) % len(syllables)]
        if w in seen:
            continue
        seen.add(w)
        vocab.append(w)
    return vocab


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bpe_vocab_corpus")
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--word-types", type=int, default=4000)
    ap.add_argument("--zipf-s", type=float, default=1.1)
    ap.add_argument("--seed", type=int, default=20260815)
    args = ap.parse_args()

    marker = os.path.join(args.out, "_DONE")
    if os.path.exists(marker):
        print(f"{args.out} already generated (delete {marker} to force)")
        return

    rng = np.random.default_rng(args.seed)
    vocab = np.array(build_vocab(args.word_types, rng))
    # Zipf pmf over ranks 1..n
    p = 1.0 / np.arange(1, args.word_types + 1) ** args.zipf_s
    p /= p.sum()

    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    lang_cycle = ["en", "zh", "de", "fr", "es", "ru", "ja", "pt", "it", "nl"]
    lengths = np.maximum(
        rng.normal(120, 40, args.docs).astype(int), 10
    )
    for i in range(args.docs):
        words = vocab[rng.choice(args.word_types, size=int(lengths[i]), p=p)]
        text = " ".join(words.tolist())
        doc_ids.append(i)
        texts.append(text)
        langs.append(lang_cycle[i % len(lang_cycle)])
        sources.append(f"src{i % 7}")
        n_chars.append(len(text))

    os.makedirs(args.out, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(args.out, "documents.parquet"))
    with open(marker, "w") as f:
        f.write(
            f"seed={args.seed} docs={args.docs} word_types={args.word_types} "
            f"zipf_s={args.zipf_s}\n"
        )
    total_tokens = sum(int(x) for x in lengths)
    print(
        f"wrote {args.out}/documents.parquet: {args.docs} docs, "
        f"{args.word_types} word types, ~{total_tokens} tokens, "
        f"zipf s={args.zipf_s}, seed={args.seed}"
    )


if __name__ == "__main__":
    main()
