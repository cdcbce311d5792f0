"""Chat-training-data prep (stages/chatprep.py) + FIM transform
(stages/textops.fim_split): structure edge cases the synthetic corpus
never produces — same-role adjacency, empty turns, single-turn convs,
out-of-order / cross-block rows — plus brute-force parity."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.stages.chatprep import (
    chat_lint,
    chat_render,
    sft_examples,
    sft_pairs,
)
from hybrid_sanctions_search_engine_ray.stages.textops import fim_split


def _ds(rows, ray_session, blocks=3):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    return rd.from_pandas(df).repartition(blocks)


# A deliberately messy corpus: conv A alternates cleanly; conv B has a
# same-role adjacency, an empty turn and starts with assistant; conv C
# is a single user turn; rows are SHUFFLED so no block holds a whole
# conversation in order.
ROWS = [
    ("A", 0, "user", "hi"),
    ("A", 1, "assistant", "hello"),
    ("A", 2, "user", "how are you"),
    ("A", 3, "assistant", "fine"),
    ("B", 0, "assistant", "preamble"),
    ("B", 1, "user", ""),
    ("B", 2, "user", "double user"),
    ("B", 3, "assistant", "reply"),
    ("C", 0, "user", "alone"),
]
SHUFFLED = [ROWS[i] for i in [5, 0, 7, 2, 8, 1, 6, 3, 4]]


def test_sft_pairs_edges(ray_session):
    out = sft_pairs(_ds(SHUFFLED, ray_session), num_buckets=4).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # A: (0→1), (2→3); B: only (2→3) — (1→2) is user→user, (0) has no prev
    assert list(zip(out.conv_id, out.turn_idx)) == [("A", 1), ("A", 3), ("B", 3)]
    assert list(out.prompt) == ["hi", "how are you", "double user"]
    assert list(out.response) == ["hello", "fine", "reply"]


def test_sft_examples_context_order(ray_session):
    out = sft_examples(_ds(SHUFFLED, ray_session), num_buckets=4).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # every assistant turn with >=1 preceding turn; B turn 0 is excluded
    assert list(zip(out.conv_id, out.turn_idx)) == [("A", 1), ("A", 3), ("B", 3)]
    a3 = out[(out.conv_id == "A") & (out.turn_idx == 3)].iloc[0]
    assert a3.context == "<|user|>hi\n<|assistant|>hello\n<|user|>how are you"
    assert a3.target == "fine"
    b3 = out[out.conv_id == "B"].iloc[0]
    assert b3.context == "<|assistant|>preamble\n<|user|>\n<|user|>double user"


def test_chat_render_order_and_counts(ray_session):
    out = chat_render(_ds(SHUFFLED, ray_session), num_buckets=4).to_pandas()
    out = out.set_index("conv_id")
    assert out.loc["A", "rendered"] == (
        "<|user|>hi\n<|assistant|>hello\n<|user|>how are you\n<|assistant|>fine")
    assert out.loc["C", "rendered"] == "<|user|>alone"
    assert int(out.loc["B", "n_turns"]) == 4
    assert int(out.loc["A", "n_chars"]) == len(out.loc["A", "rendered"])


def test_chat_lint_flags(ray_session):
    out = chat_lint(_ds(SHUFFLED, ray_session), num_buckets=4).to_pandas()
    out = out.set_index("conv_id")
    a, b, c = out.loc["A"], out.loc["B"], out.loc["C"]
    assert bool(a.alternation_ok) and a.first_role == "user" and a.last_role == "assistant"
    assert int(a.n_user) == 2 and int(a.n_assistant) == 2 and int(a.n_empty) == 0
    assert not bool(b.alternation_ok)          # starts with assistant + user,user
    assert int(b.n_same_role_adj) == 1 and int(b.n_empty) == 1
    assert b.first_role == "assistant"
    assert bool(c.alternation_ok) and int(c.n_turns) == 1 and c.last_role == "user"


def test_chatprep_bucket_invariance(ray_session):
    """Results must not depend on the bucket count (the shuffle coarsening
    is an implementation detail)."""
    a = sft_pairs(_ds(SHUFFLED, ray_session, blocks=1), num_buckets=1).to_pandas()
    b = sft_pairs(_ds(SHUFFLED, ray_session, blocks=5), num_buckets=64).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def _fim_brute(doc_id: int, s: str):
    h = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "little")
    L = len(s)
    a = h % (L + 1)
    b = a + (h // (L + 1)) % (L - a + 1)
    return a, b, f"<PRE>{s[:a]}<SUF>{s[b:]}<MID>{s[a:b]}"


@pytest.mark.parametrize("text", ["", "x", "hello world", "пётр café —", "a" * 500])
def test_fim_split_brute(text):
    t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": [text]})
    row = fim_split(t).to_pandas().iloc[0]
    a, b, fim = _fim_brute(7, text)
    assert (row.a, row.b, row.fim_text) == (a, b, fim)
    # reconstruction invariant: PSM re-assembles to the original
    pre = row.fim_text[5:row.fim_text.index("<SUF>")]
    suf = row.fim_text[row.fim_text.index("<SUF>") + 5: row.fim_text.index("<MID>")]
    mid = row.fim_text[row.fim_text.index("<MID>") + 5:]
    assert pre + mid + suf == text


def test_fim_split_positions_in_range():
    ids = pa.array(np.arange(200), pa.int64())
    texts = pa.array([f"doc {i} " + "tok " * (i % 17) for i in range(200)])
    out = fim_split(pa.table({"doc_id": ids, "text": texts})).to_pandas()
    lens = np.array([len(t) for t in texts.to_pylist()])
    assert ((0 <= out.a) & (out.a <= out.b) & (out.b <= lens)).all()


def test_conv_split_no_leakage(ray_session):
    """conv-keyed split: every conversation's turns land in ONE split."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.q_conv_split("/root/testdata/sf0.001")
    assert int(out["n_leaked"].iloc[0]) == 0
    assert set(out["split"]) <= {"train", "val", "test"}
    assert out["n_turns"].sum() == 500 and out["n_convs"].sum() == 63


def test_pack_conversations_contiguous_budget(ray_session):
    """Packs are contiguous conv runs; every pack except possibly the
    last stops only once the budget is crossed."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.chatprep import pack_conversations

    df = pd.DataFrame({
        "conv_id": [f"conv-{i:08d}" for i in range(40)],
        "rendered": ["tok " * (7 + i % 11) for i in range(40)],
    })
    out = (pack_conversations(rd.from_pandas(df).repartition(4), budget=50)
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    n = out["n_tokens"].to_numpy()
    before = np.cumsum(n) - n
    np.testing.assert_array_equal(out["pack_id"].to_numpy(), before // 50)
    # contiguity: pack ids are nondecreasing in conv order
    assert (np.diff(out["pack_id"].to_numpy()) >= 0).all()


def test_ngram_novelty_value(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.q_ngram_novelty("/root/testdata/sf0.001").iloc[0]
    assert int(out.n_val_grams) > 0
    assert 0 <= int(out.n_shared) <= int(out.n_val_grams)
    assert 0.0 <= out.novelty_frac <= 1.0


def test_dpo_pairs_selection_rules(ray_session):
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.stages.chatprep import dpo_pairs

    rows = [
        # conv A: clear winner/loser by token count
        {"conv_id": "A", "turn_idx": 0, "role": "user", "text": "ask one"},
        {"conv_id": "A", "turn_idx": 1, "role": "assistant", "text": "a b c d e"},
        {"conv_id": "A", "turn_idx": 3, "role": "assistant", "text": "short"},
        # conv B: all-equal counts -> (first, last) assistant turns
        {"conv_id": "B", "turn_idx": 0, "role": "user", "text": "ask two"},
        {"conv_id": "B", "turn_idx": 1, "role": "assistant", "text": "same len"},
        {"conv_id": "B", "turn_idx": 2, "role": "assistant", "text": "also two"},
        # conv C: only one assistant turn -> dropped
        {"conv_id": "C", "turn_idx": 0, "role": "user", "text": "ask"},
        {"conv_id": "C", "turn_idx": 1, "role": "assistant", "text": "only"},
        # conv D: no user turn -> dropped
        {"conv_id": "D", "turn_idx": 0, "role": "assistant", "text": "x y"},
        {"conv_id": "D", "turn_idx": 1, "role": "assistant", "text": "z"},
    ]
    out = dpo_pairs(rd.from_items(rows)).to_pandas().sort_values("conv_id")
    assert out["conv_id"].tolist() == ["A", "B"]
    a = out[out.conv_id == "A"].iloc[0]
    assert a["chosen"] == "a b c d e" and a["rejected"] == "short"
    assert a["prompt"] == "ask one"
    assert (a["chosen_turn"], a["rejected_turn"]) == (1, 3)
    b = out[out.conv_id == "B"].iloc[0]
    assert (b["chosen_turn"], b["rejected_turn"]) == (1, 2)
    assert b["chosen_ntok"] == b["rejected_ntok"] == 2
