import os

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from hybrid_sanctions_search_engine_ray.state.manifest import IndexManifest


def test_manifest_complete(built_index):
    index_dir, cfg, manifest = built_index
    assert manifest.status == "complete"
    assert manifest.n_docs > 0
    assert manifest.avgdl > 0
    assert manifest.n_terms > 0
    assert len(manifest.parts) > 0
    m2 = IndexManifest.load(index_dir)
    assert m2.n_docs == manifest.n_docs


def test_layout_on_disk(built_index):
    index_dir, cfg, manifest = built_index
    assert os.path.isdir(os.path.join(index_dir, "docmap.parquet"))
    seg_root = os.path.join(index_dir, "segments")
    parts = [p for p in os.listdir(seg_root) if p.startswith("part=")]
    assert parts
    for p in parts:
        assert os.path.exists(os.path.join(seg_root, p, "postings.parquet"))
        assert os.path.exists(os.path.join(seg_root, p, "meta.json"))


def test_hot_terms_detected_and_salted(built_index):
    """The Zipf head must be flagged hot and split across partitions."""
    index_dir, cfg, manifest = built_index
    assert manifest.hot_terms, "stop-word-heavy corpus must produce hot terms"
    hot = manifest.hot_terms[0]
    seg_root = os.path.join(index_dir, "segments")
    parts_with_hot = 0
    for p in os.listdir(seg_root):
        f = os.path.join(seg_root, p, "postings.parquet")
        t = pads.dataset(f).to_table(filter=pads.field("term") == hot, columns=["term"])
        parts_with_hot += int(t.num_rows > 0)
    assert parts_with_hot > 1, f"hot term {hot!r} should be salted across partitions"


def test_docid_invariant(built_index, corpus_dir):
    """North-rule per-row invariant: doc ids are the rank under stable
    (conv_id, turn_idx) ordering, and joining docmap back to the input
    reproduces the corpus exactly."""
    index_dir, cfg, manifest = built_index
    dm = pq.read_table(os.path.join(index_dir, "docmap.parquet")).to_pandas()
    src = pads.dataset(corpus_dir).to_table(columns=["conv_id", "turn_idx"]).to_pandas()
    src = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    dm = dm.sort_values("doc_id").reset_index(drop=True)
    assert len(dm) == len(src)
    assert np.array_equal(dm["doc_id"].to_numpy(), np.arange(len(dm)))
    assert (dm["conv_id"].to_numpy() == src["conv_id"].to_numpy()).all()
    assert (dm["turn_idx"].to_numpy() == src["turn_idx"].to_numpy()).all()


def test_assume_sorted_equivalence(tmp_path, corpus_dir, built_index):
    """The generator's shard layout is globally sorted, so the
    assume_sorted fast path must produce an identical docmap to the
    sort-based build."""
    import pandas as pd

    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index

    index_dir, cfg, _ = built_index
    fast_dir = str(tmp_path / "fast")
    build_index(corpus_dir, fast_dir, cfg, assume_sorted=True)
    cols = ["doc_id", "conv_id", "turn_idx"]  # fast-path docmap omits text
    a = pq.read_table(os.path.join(index_dir, "docmap.parquet"), columns=cols).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pq.read_table(os.path.join(fast_dir, "docmap.parquet"), columns=cols).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_write_dictionary_utility(built_index):
    """write_dictionary materializes exact (term, df, cf) from segments;
    Σ df equals Σ n_docs over the raw segment rows (no postings lost in
    the shuffle, sub-segmenting or salting)."""
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import write_dictionary

    index_dir, cfg, manifest = built_index
    seg_root = os.path.join(index_dir, "segments")
    total_seg = 0
    for p in os.listdir(seg_root):
        f = os.path.join(seg_root, p, "postings.parquet")
        total_seg += sum(pq.read_table(f, columns=["n_docs"])["n_docs"].to_pylist())
    dict_path = write_dictionary(index_dir)
    d = pq.read_table(dict_path).to_pandas()
    assert int(d["df"].sum()) == total_seg
    assert d["term"].is_unique


def test_lang_col_survives_checkpoint_build(ray_session, tmp_path):
    """A full-mode lang_col build through the CHECKPOINT path (input
    without doc ids) must carry the language column into the postings
    scan instead of crashing after the checkpoint pass (code-review
    r05), and the column-driven case routing must be in effect."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    rows = [
        {"conv_id": f"c-{i:04d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "lang": lg}
        for i, (t, lg) in enumerate([
            ("Москва справка отчет", "ru"),
            ("plain english text", "en"),
            ("Київ звіт документ", "uk"),
        ])
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path / "langidx")
    cfg = EngineConfig(num_partitions=2,
                       analyzer=AnalyzerConfig(mode="full", lang_split_case=True,
                                               lang_col="lang"))
    m = build_index("mem", idx, cfg, transcripts_ds=ds)
    assert m.status == "complete" and m.n_docs == 3
    assert m.lang_col == "lang" and m.lang_split_case is True
    r = IndexReader(idx)
    docs, _ = r.search_one("москва", 5)
    assert list(docs) == [0]


def test_manifest_round_trips_token_bounds(ray_session, tmp_path):
    """min_token_len must survive the manifest so the reader's query
    analyzer matches the build analyzer — a 1-char query term must be
    DROPPED (matching the index), not treated as a required term with
    no postings (code-review r05)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    rows = [
        {"conv_id": f"c-{i:04d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
        for i, t in enumerate(["a moscow report", "b berlin file"])
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    idx = str(tmp_path / "boundsidx")
    cfg = EngineConfig(num_partitions=2,
                       analyzer=AnalyzerConfig(mode="simple", min_token_len=2))
    m = build_index("mem", idx, cfg, transcripts_ds=ds)
    assert m.min_token_len == 2
    r = IndexReader(idx)
    # 'a' is sub-min on both sides: neither indexed nor required
    assert set(r.analyzer("a moscow")) == {"moscow"}
    docs, _ = r.search_one("a moscow", 5)
    assert list(docs) == [0]
    assert r.load_raw("a") is None  # never indexed
