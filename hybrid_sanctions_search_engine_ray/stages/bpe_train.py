"""BPE merge training — learn the top-K byte-pair merges from a corpus,
the tokenizer-induction step of an LLM data pipeline (the counterpart
of stages/textops' BPE-ish APPLY path; reference tokenizer usage:
the reference consumes pretrained tokenizers — training them is the
upstream step this engine adds).

Scale shape — the standard vocabulary-table optimization: the corpus is
scanned ONCE to build the (word → count) frequency table (a partial-agg
shuffle; |vocab| ≪ corpus), then every merge iteration runs over the
vocabulary table only, driver-side. This is how production BPE trainers
work (counting pairs over the corpus per iteration would be K full
scans); at 100 TB the word table is still millions of rows, so the
iteration loop stays O(|vocab| · avg_word_len) — independent of corpus
size. Determinism: ties on pair count break lexicographically, so the
merge sequence is reproducible."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _word_counts(ds, col: str) -> pd.DataFrame:
    """ONE corpus scan → (word, count): lowercase, split on
    non-alphanumeric runs (the simple-analyzer token rule)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from hybrid_sanctions_search_engine_ray.stages.analyze import (
            _SIMPLE_RE2,
            _lower_nfc,
        )

        s = pc.fill_null(b[col], "")
        # the shared simple-analyzer kernel (NFC + lower + split): the
        # bare utf8_lower used before tokenized decomposed (NFD) input
        # differently from the analyzer the engine indexes with —
        # combining marks became token separators (code-review r05)
        toks = pc.split_pattern_regex(_lower_nfc(s), _SIMPLE_RE2)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"word": flat}).group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "c_p"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c_p", alias_name="count"))
        .to_pandas()
    )


def bpe_train(ds, col: str, n_merges: int = 10,
              end_of_word: str = "</w>") -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges. Returns (merge_rank, left, right,
    pair_count) — the merge table in learned order. Words are character
    sequences with an ``end_of_word`` marker appended (the classic
    Sennrich formulation, so suffix merges differ from interior ones)."""
    vocab = _word_counts(ds, col)
    if vocab.empty:
        return pd.DataFrame({"merge_rank": pd.Series([], dtype=np.int32),
                             "left": pd.Series([], dtype=object),
                             "right": pd.Series([], dtype=object),
                             "pair_count": pd.Series([], dtype=np.int64)})
    words = [tuple(w) + (end_of_word,) for w in vocab["word"].tolist()]
    counts = vocab["count"].to_numpy(dtype=np.int64)
    out = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, c in zip(words, counts):
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        # deterministic: count desc, then lexicographic pair asc
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break  # nothing co-occurs anymore — stop early
        merged = a + b
        new_words = []
        for sym in words:
            if a not in sym:
                new_words.append(sym)
                continue
            w = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    w.append(merged)
                    i += 2
                else:
                    w.append(sym[i])
                    i += 1
            new_words.append(tuple(w))
        words = new_words
        out.append({"merge_rank": np.int32(rank), "left": a, "right": b,
                    "pair_count": np.int64(n)})
    return pd.DataFrame(out)
