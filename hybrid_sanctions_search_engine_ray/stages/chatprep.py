"""Chat-training-data preparation over the transcript stream.

The input_hint table IS a chat corpus — (conv_id, turn_idx, role, text,
tool, ts) — so the standard LLM-SFT preprocessing steps are first-class
operators here, the way C4/Dolma text ops are for the documents table:

- ``sft_pairs``      — (prompt, response) extraction: every assistant
  turn whose IMMEDIATELY preceding turn (turn_idx − 1, same conv) is a
  user turn becomes one supervised pair. The standard single-turn SFT
  projection of multi-turn logs.
- ``sft_examples``   — full-history examples: every assistant turn with
  at least one preceding turn becomes (context, target) where context
  renders ALL preceding turns of the conversation in order (the
  multi-turn SFT expansion; context is the chat template below).
- ``chat_render``    — one training document per conversation: turns
  rendered ``<|role|>text`` and joined with newlines in turn order (the
  chat-template flattening used before tokenization/packing).
- ``chat_lint``      — per-conversation structural quality report
  (first/last role, per-role turn counts, empty-text count, adjacent
  same-role violations, alternation flag) — the validation gate a chat
  corpus passes before training.

Scale shape (shared): conversations must be reunited, so there is
exactly ONE hash exchange keyed by a coarsened bucket
``crc32(conv_id) % num_buckets`` — NOT per-conversation groups. Each
``map_groups`` call then handles thousands of conversations at once
with vectorized kernels (factorize + lexsort + run-boundary numpy,
``pyarrow.compute.binary_join`` over offset-built ListArrays for the
string assembly); there is no per-conversation Python call and no
per-row Python loop. Only the columns a step needs are shuffled.
Skew: conversations are bounded (turns per conv is small by
construction of the corpus); a pathological million-turn conv would sit
inside one bucket with its neighbours — salt by turn-range if that ever
holds at 100 TB.

Determinism: output depends only on (conv_id, turn_idx) order — batch/
retry/repartition invariant, so every op is exactly SQL-twinnable
(LAG / string_agg-over-window / string_agg-group twins).

Reference analog: none (the reference indexes sanction entities, not
chat logs); these are the transcript-native members of the brief's
training-data operator family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.hashing import (
    factorize_exact,
    hash_string_array,
)

_NUM_BUCKETS = 256


def _with_bucket(ds, num_buckets: int, columns: list[str]):
    """Project to ``columns`` and attach the coarse shuffle bucket."""

    def add(b: pa.Table) -> pa.Table:
        t = b.select(columns)
        bk = hash_string_array(b["conv_id"]).astype(np.int64) % num_buckets
        return t.append_column("bucket", pa.array(bk, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _sorted_runs(g: pd.DataFrame):
    """(order, codes, starts) for a bucket: rows lexsorted by
    (conv_id, turn_idx), conv run starts. All vectorized."""
    codes, _ = factorize_exact(g["conv_id"].to_numpy())
    turn = g["turn_idx"].to_numpy().astype(np.int64)
    order = np.lexsort((turn, codes))
    c = codes[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]]) if c.size else np.empty(0, np.int64)
    return order, c, starts


def _render_pieces(role: np.ndarray, text: np.ndarray) -> pa.Array:
    """``<|role|>text`` per row (one Arrow kernel, no Python concat).
    Null text renders as empty — a null piece would otherwise propagate
    into null rendered strings and INT64_MIN char counts / garbage
    loss-mask offsets downstream (code-review r05 finding)."""
    n = len(role)
    return pc.binary_join_element_wise(
        pa.array(["<|"] * n, pa.string()),
        pa.array(role, pa.string()),
        pa.array(["|>"] * n, pa.string()),
        pc.fill_null(pa.array(text, pa.string()), ""),
        "",
    )


def sft_pairs(transcripts_ds, num_buckets: int = _NUM_BUCKETS):
    """(conv_id, turn_idx, prompt, response) — one row per assistant
    turn directly preceded (turn_idx − 1) by a user turn. ``turn_idx``
    is the RESPONSE turn's index. SQL twin: LAG over
    (PARTITION BY conv_id ORDER BY turn_idx)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                 "turn_idx": pd.Series([], dtype=np.int32),
                                 "prompt": pd.Series([], dtype=object),
                                 "response": pd.Series([], dtype=object)})
        order, c, _ = _sorted_runs(g)
        conv = g["conv_id"].to_numpy()[order]
        turn = g["turn_idx"].to_numpy().astype(np.int64)[order]
        role = g["role"].to_numpy()[order]
        text = g["text"].to_numpy()[order]
        ok = (
            (c[1:] == c[:-1])
            & (turn[1:] == turn[:-1] + 1)
            & (role[:-1] == "user")
            & (role[1:] == "assistant")
        )
        at = np.flatnonzero(ok)
        return pd.DataFrame({
            "conv_id": conv[at + 1],
            "turn_idx": turn[at + 1].astype(np.int32),
            "prompt": text[at],
            "response": text[at + 1],
        })

    return (
        _with_bucket(transcripts_ds, num_buckets, ["conv_id", "turn_idx", "role", "text"])
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def sft_examples(transcripts_ds, num_buckets: int = _NUM_BUCKETS):
    """(conv_id, turn_idx, context, target) — one row per assistant turn
    with ≥1 preceding turn; ``context`` is every preceding turn rendered
    ``<|role|>text`` and newline-joined in turn order. SQL twin:
    string_agg(...) OVER (... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)."""

    def examples(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                              "turn_idx": pd.Series([], dtype=np.int32),
                              "context": pd.Series([], dtype=object),
                              "target": pd.Series([], dtype=object)})
        if len(g) == 0:
            return empty
        order, c, starts = _sorted_runs(g)
        conv = g["conv_id"].to_numpy()[order]
        turn = g["turn_idx"].to_numpy().astype(np.int64)[order]
        role = g["role"].to_numpy()[order]
        text = g["text"].to_numpy()[order]
        pieces = _render_pieces(role, text)

        run_of = np.cumsum(np.r_[False, c[1:] != c[:-1]])  # run index per row
        run_start = starts[run_of]                          # conv start per row
        pos = np.arange(c.size, dtype=np.int64)
        at = np.flatnonzero((role == "assistant") & (pos > run_start))
        if at.size == 0:
            return empty
        # context rows for example i: run_start[i] .. at[i]-1  — build the
        # flat gather index with one repeat/arange trick, then ONE
        # binary_join over an offset-built ListArray.
        s = run_start[at]
        lens = at - s
        off = np.r_[0, np.cumsum(lens)]
        idx = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], lens) + np.repeat(s, lens)
        # int64 offsets: the context gather is quadratic per conversation
        # summed per bucket, which can exceed 2^31 at corpus scale
        # (code-review r05 finding)
        ctx_list = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pieces.take(pa.array(idx, pa.int64()))
        )
        ctx = pc.binary_join(ctx_list, "\n")
        return pd.DataFrame({
            "conv_id": conv[at],
            "turn_idx": turn[at].astype(np.int32),
            "context": ctx.to_pandas().to_numpy(dtype=object),
            "target": text[at],
        })

    return (
        _with_bucket(transcripts_ds, num_buckets, ["conv_id", "turn_idx", "role", "text"])
        .groupby("bucket")
        .map_groups(examples, batch_format="pandas")
    )


def chat_render(transcripts_ds, num_buckets: int = _NUM_BUCKETS):
    """(conv_id, n_turns, rendered, n_chars) — the whole conversation as
    one training document: ``<|role|>text`` turns newline-joined in turn
    order. SQL twin: string_agg(..., chr(10) ORDER BY turn_idx)."""

    def render(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                 "n_turns": pd.Series([], dtype=np.int64),
                                 "rendered": pd.Series([], dtype=object),
                                 "n_chars": pd.Series([], dtype=np.int64)})
        order, c, starts = _sorted_runs(g)
        conv = g["conv_id"].to_numpy()[order]
        role = g["role"].to_numpy()[order]
        text = g["text"].to_numpy()[order]
        pieces = _render_pieces(role, text)
        off = np.r_[starts, c.size]
        # int64 offsets: summed context expansion can exceed 2^31 at
        # corpus scale (code-review r05 finding)
        la = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), pieces)
        rendered = pc.binary_join(la, "\n")
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": np.diff(off).astype(np.int64),
            "rendered": rendered.to_pandas().to_numpy(dtype=object),
            "n_chars": pc.utf8_length(rendered).to_numpy(zero_copy_only=False).astype(np.int64),
        })

    return (
        _with_bucket(transcripts_ds, num_buckets, ["conv_id", "turn_idx", "role", "text"])
        .groupby("bucket")
        .map_groups(render, batch_format="pandas")
    )


def chat_lint(transcripts_ds, num_buckets: int = _NUM_BUCKETS):
    """Per-conversation structural report: (conv_id, n_turns, first_role,
    last_role, n_user, n_assistant, n_tool, n_empty, n_same_role_adj,
    alternation_ok). ``n_same_role_adj`` counts adjacent turns with the
    same role (ordered by turn_idx); ``alternation_ok`` = no such pair
    AND the conversation opens with a user turn."""

    def lint(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "first_role": pd.Series([], dtype=object),
                "last_role": pd.Series([], dtype=object),
                "n_user": pd.Series([], dtype=np.int64),
                "n_assistant": pd.Series([], dtype=np.int64),
                "n_tool": pd.Series([], dtype=np.int64),
                "n_empty": pd.Series([], dtype=np.int64),
                "n_same_role_adj": pd.Series([], dtype=np.int64),
                "alternation_ok": pd.Series([], dtype=bool),
            })
        order, c, starts = _sorted_runs(g)
        conv = g["conv_id"].to_numpy()[order]
        role = g["role"].to_numpy()[order]
        text = g["text"].to_numpy()[order]
        off = np.r_[starts, c.size]
        ends = off[1:] - 1
        same_adj = np.r_[(c[1:] == c[:-1]) & (role[1:] == role[:-1]), False]

        def per_run(vals: np.ndarray) -> np.ndarray:
            return np.add.reduceat(vals.astype(np.int64), starts)

        n_same = per_run(same_adj)
        n_user = per_run(role == "user")
        n_assistant = per_run(role == "assistant")
        n_tool = per_run(role == "tool")
        # None counts as empty too (pandas object arrays carry None
        # for null text — code-review r05 finding)
        n_empty = per_run((text == "") | (text == None))  # noqa: E711
        first_role = role[starts]
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": np.diff(off).astype(np.int64),
            "first_role": first_role,
            "last_role": role[ends],
            "n_user": n_user,
            "n_assistant": n_assistant,
            "n_tool": n_tool,
            "n_empty": n_empty,
            "n_same_role_adj": n_same,
            "alternation_ok": (n_same == 0) & (first_role == "user"),
        })

    return (
        _with_bucket(transcripts_ds, num_buckets, ["conv_id", "turn_idx", "role", "text"])
        .groupby("bucket")
        .map_groups(lint, batch_format="pandas")
    )


def loss_mask_spans(transcripts_ds, num_buckets: int = _NUM_BUCKETS):
    """Assistant-only loss-mask offsets: for each assistant turn, the
    [start_off, end_off) CHARACTER span its raw text occupies inside the
    conversation's ``chat_render`` string (train-on-assistant-tokens-only
    masking — the companion op to ``chat_render``; a tokenizer maps char
    spans to token spans downstream).

    start = Σ_{preceding turns} (len(piece) + 1)  [the newline]
            + len("<|role|>"), end = start + len(text). Same single
    bucket exchange + vectorized run kernels as the rest of the family.
    SQL twin: windowed sum of rendered piece lengths."""

    def spans(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                 "turn_idx": pd.Series([], dtype=np.int32),
                                 "start_off": pd.Series([], dtype=np.int64),
                                 "end_off": pd.Series([], dtype=np.int64)})
        order, c, starts = _sorted_runs(g)
        conv = g["conv_id"].to_numpy()[order]
        turn = g["turn_idx"].to_numpy().astype(np.int64)[order]
        role = g["role"].to_numpy()[order]
        text = g["text"].to_numpy()[order]
        pieces = _render_pieces(role, text)
        plen = pc.utf8_length(pieces).to_numpy(zero_copy_only=False).astype(np.int64)
        tlen = pc.utf8_length(pa.array(text, pa.string())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rlen = plen - tlen  # len("<|role|>")
        cum = np.cumsum(plen + 1)
        abs_start = np.r_[0, cum[:-1]]                # piece start if one string
        run_of = np.cumsum(np.r_[False, c[1:] != c[:-1]])
        piece_start = abs_start - abs_start[starts][run_of]  # within-conv offset
        at = np.flatnonzero(role == "assistant")
        start = piece_start[at] + rlen[at]
        return pd.DataFrame({
            "conv_id": conv[at],
            "turn_idx": turn[at].astype(np.int32),
            "start_off": start,
            "end_off": start + tlen[at],
        })

    return (
        _with_bucket(transcripts_ds, num_buckets, ["conv_id", "turn_idx", "role", "text"])
        .groupby("bucket")
        .map_groups(spans, batch_format="pandas")
    )


def pack_conversations(rendered_ds, cfg=None, budget: int = 512,
                       range_size: int = 1024):
    """Chat-corpus packing: assign each RENDERED conversation (in
    conv_id order) to the training pack whose token budget its
    predecessors fill — ``pack_id = tokens_before // budget``. The
    final step of the SFT assembly line (chat_render → tokenize →
    pack); packs are contiguous conversation runs of ≈``budget``
    analyzer tokens.

    Same distributed-prefix-sum shape as relational.pack_bins: token
    counts are one streaming analyzer pass ((conv, n_tokens) pairs,
    ~tens of bytes each); per-range partial sums (range = conv ordinal
    // range_size, the ordinal parsed from the conv-%08d id) ship a
    range-count-sized table to the driver for exclusive offsets; one
    groupby(range) pass cumsums within ranges. Rendered text shuffles
    zero times after the render itself.

    Returns (conv_id, n_tokens, pack_id)."""
    import ray
    from ray.data.aggregate import Sum

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    cfg = cfg or AnalyzerConfig()

    def counts(b: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": pa.array(np.arange(len(b)), pa.int64()),
                      "text": b["rendered"]})
        parent, _terms = flat_terms(t, cfg)
        n = np.zeros(len(b), dtype=np.int64)
        if parent.size:
            starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
            n[parent[starts]] = np.diff(np.r_[starts, parent.size])
        conv = b["conv_id"].to_numpy(zero_copy_only=False)
        ordinal = np.array([int(str(c).rsplit("-", 1)[-1]) for c in conv],
                           dtype=np.int64)
        return pa.table({"conv_id": pa.array(conv, pa.string()),
                         "ordinal": pa.array(ordinal),
                         "n_tokens": pa.array(n),
                         "rng": pa.array(ordinal // range_size)})

    pairs = rendered_ds.map_batches(counts, batch_format="pyarrow").materialize()

    def rng_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"rng": b["rng"], "n": b["n_tokens"]}).group_by("rng").aggregate(
            [("n", "sum")])
        return g.rename_columns(["rng", "n_p"])

    totals = (
        pairs.map_batches(rng_partial, batch_format="pyarrow")
        .groupby("rng").aggregate(Sum("n_p", alias_name="n")).to_pandas()
        .sort_values("rng", kind="mergesort")
    )
    rngs = totals["rng"].to_numpy(np.int64)
    offsets = np.r_[0, np.cumsum(totals["n"].to_numpy(np.int64))][:-1]
    off_ref = ray.put({"rngs": rngs, "offsets": offsets})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        g = g.sort_values("ordinal", kind="mergesort").reset_index(drop=True)
        base = o["offsets"][int(np.searchsorted(o["rngs"], int(g["rng"].iloc[0])))]
        n = g["n_tokens"].to_numpy(np.int64)
        before = base + np.cumsum(n) - n
        return pd.DataFrame({"conv_id": g["conv_id"],
                             "n_tokens": g["n_tokens"].astype(np.int64),
                             "pack_id": (before // budget).astype(np.int64)})

    return pairs.groupby("rng").map_groups(assign, batch_format="pandas")


def dpo_pairs(transcripts_ds, num_buckets: int = _NUM_BUCKETS,
              cfg: AnalyzerConfig | None = None):
    """Preference-pair construction (the DPO/RLHF dataset shape): one
    row per conversation with ≥2 assistant turns and ≥1 user turn —
    ``chosen`` = the assistant turn ranked first by (token count desc,
    turn_idx asc), ``rejected`` = first by (token count asc, turn_idx
    desc), ``prompt`` = the conversation's first user turn. The
    token-count heuristic is the DOCUMENTED deterministic stand-in for
    a human/RM preference label — the op's value is the leakage-safe
    conversation-keyed assembly plumbing, which is exactly what a real
    label column would ride through. Token counts use the simple
    analyzer (``flat_terms``), so they are dl-parity with the SQL tok
    CTE and the pair choice is exact on both sides; with all-equal
    counts the rule degenerates to (first, last) assistant turn, so
    chosen ≠ rejected always holds.

    Scale shape: the ONE coarse conv-bucket exchange every chatprep op
    shares; inside each bucket all selection is vectorized (lexsort +
    run-start reduceat — no per-conversation Python)."""
    from hybrid_sanctions_search_engine_ray.stages.analyze import flat_terms

    cfg = cfg or AnalyzerConfig()
    empty = pd.DataFrame({
        "conv_id": pd.Series([], dtype=object),
        "prompt": pd.Series([], dtype=object),
        "chosen": pd.Series([], dtype=object),
        "rejected": pd.Series([], dtype=object),
        "chosen_turn": pd.Series([], dtype=np.int32),
        "rejected_turn": pd.Series([], dtype=np.int32),
        "chosen_ntok": pd.Series([], dtype=np.int64),
        "rejected_ntok": pd.Series([], dtype=np.int64),
    })

    def pick_first_per_run(codes_sorted: np.ndarray) -> np.ndarray:
        if codes_sorted.size == 0:
            return np.empty(0, dtype=np.int64)
        return np.flatnonzero(np.r_[True, codes_sorted[1:] != codes_sorted[:-1]])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty
        parent, _terms = flat_terms(
            pa.Table.from_pandas(g[["text"]], preserve_index=False), cfg)
        ntok = np.bincount(parent, minlength=len(g)).astype(np.int64)
        codes, _u = factorize_exact(g["conv_id"].to_numpy())
        turn = g["turn_idx"].to_numpy().astype(np.int64)
        role = g["role"].to_numpy()
        text = g["text"].to_numpy()
        conv = g["conv_id"].to_numpy()

        am = role == "assistant"
        ac, at_, an_, atx = codes[am], turn[am], ntok[am], text[am]
        if ac.size == 0:
            return empty
        # chosen: first per conv by (ntok desc, turn asc)
        oc = np.lexsort((at_, -an_, ac))
        cs = pick_first_per_run(ac[oc])
        chosen_idx = oc[cs]
        # rejected: first per conv by (ntok asc, turn desc)
        orj = np.lexsort((-at_, an_, ac))
        rs = pick_first_per_run(ac[orj])
        rejected_idx = orj[rs]
        # assistant-turn count per conv (aligned with run order of ac[oc])
        n_per = np.bincount(ac, minlength=0)
        keep = n_per[ac[chosen_idx]] >= 2

        um = role == "user"
        uc, ut, utx = codes[um], turn[um], text[um]
        ou = np.lexsort((ut, uc))
        us = pick_first_per_run(uc[ou])
        first_user_idx = ou[us]
        prompt_arr = np.full(len(_u), None, dtype=object)
        prompt_arr[uc[first_user_idx]] = utx[first_user_idx]

        ci = chosen_idx[keep]
        ri = rejected_idx[keep]
        ccode = ac[ci]
        has_prompt = np.array([prompt_arr[c] is not None for c in ccode],
                              dtype=bool) if ccode.size else np.empty(0, bool)
        ci, ri, ccode = ci[has_prompt], ri[has_prompt], ccode[has_prompt]
        if ci.size == 0:
            return empty
        return pd.DataFrame({
            "conv_id": np.asarray(_u, dtype=object)[ccode],
            "prompt": prompt_arr[ccode],
            "chosen": atx[ci],
            "rejected": atx[ri],
            "chosen_turn": at_[ci].astype(np.int32),
            "rejected_turn": at_[ri].astype(np.int32),
            "chosen_ntok": an_[ci].astype(np.int64),
            "rejected_ntok": an_[ri].astype(np.int64),
        })

    return (
        _with_bucket(transcripts_ds, num_buckets,
                     ["conv_id", "turn_idx", "role", "text"])
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
