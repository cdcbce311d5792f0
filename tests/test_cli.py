"""CLI surface (cli.main, in-process): build → query → delete →
compact → stats round-trip, and the multi-field builder."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hybrid_sanctions_search_engine_ray.cli import main


def _write_corpus(tmp_path, n=40):
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user",
         "text": f"wire transfer fee number {i} spark join" if i % 2 == 0
                 else f"customer table scan order {i}",
         "tool": "", "ts": pd.Timestamp(2026, 1, 1)}
        for i in range(n)
    ]
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
                   str(d / "part-0.parquet"))
    return str(d)


def test_cli_build_query_delete_compact_stats(ray_session, tmp_path, capsys):
    corpus = _write_corpus(tmp_path)
    idx = str(tmp_path / "idx")
    assert main(["build", "--input", corpus, "--index", idx, "--num-partitions", "4"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["status"] == "complete" and built["n_docs"] == 40

    assert main(["query", "--index", idx, "--query", "wire transfer", "--top-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out and "score" in out

    assert main(["delete", "--index", idx, "--doc-ids", "0,2"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["tombstones_pending"] == 2

    assert main(["compact", "--index", idx]) == 0
    compacted = json.loads(capsys.readouterr().out.strip())
    assert compacted["n_docs"] == 38

    assert main(["stats", "--index", idx]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert st["n_docs"] == 38 and st["status"] == "complete"


def test_cli_build_multi(ray_session, tmp_path, capsys):
    corpus = _write_corpus(tmp_path)
    base = str(tmp_path / "mfidx")
    assert main(["build-multi", "--input", corpus, "--base", base,
                 "--modes", "simple,shingle", "--num-partitions", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["simple"]["n_docs"] == 40 and out["shingle"]["n_docs"] == 40
    assert os.path.isdir(os.path.join(base, "field=shingle"))


def test_cli_build_from_documents_and_reindex(ray_session, tmp_path, capsys):
    import json

    from hybrid_sanctions_search_engine_ray.cli import main

    idx = str(tmp_path / "didx")
    assert main(["build", "--input", "/root/testdata/sf0.001/documents.parquet",
                 "--index", idx, "--num-partitions", "4", "--documents",
                 "--store-text"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "complete" and out["n_docs"] == 500
    ridx = str(tmp_path / "ridx")
    assert main(["reindex", "--index", idx, "--out", ridx,
                 "--mode", "char3", "--num-partitions", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "complete" and out["analyzer"] == "char3"
    assert main(["query", "--index", ridx, "--query", "sprak", "--top-k", "3"]) == 0
    assert "doc_id" in capsys.readouterr().out


def test_alias_registry_atomic_swap(ray_session, tmp_path, capsys):
    import pytest

    from hybrid_sanctions_search_engine_ray.state import aliases as al

    corpus = _write_corpus(tmp_path)
    idx1, idx2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    reg = str(tmp_path / "reg")
    assert main(["build", "--input", corpus, "--index", idx1, "--num-partitions", "4"]) == 0
    assert main(["build", "--input", corpus, "--index", idx2, "--num-partitions", "4"]) == 0
    capsys.readouterr()

    # set → resolve → swap → delete, through the CLI surface
    assert main(["alias", "set", "--registry", reg, "--name", "live", "--index", idx1]) == 0
    assert json.loads(capsys.readouterr().out)["live"] == os.path.abspath(idx1)
    assert al.resolve_alias(reg, "live") == os.path.abspath(idx1)
    assert al.resolve_alias(reg, "not-an-alias") == "not-an-alias"  # pass-through
    assert main(["alias", "set", "--registry", reg, "--name", "live", "--index", idx2]) == 0
    capsys.readouterr()
    assert al.resolve_alias(reg, "live") == os.path.abspath(idx2)
    assert main(["alias", "list", "--registry", reg]) == 0
    assert json.loads(capsys.readouterr().out) == {"live": os.path.abspath(idx2)}

    # an alias must never expose an incomplete index
    broken = str(tmp_path / "broken")
    os.makedirs(broken)
    with open(os.path.join(broken, "manifest.json"), "w") as f:
        json.dump({"status": "building"}, f)
    with pytest.raises(Exception):
        al.set_alias(reg, "live", broken)
    assert al.resolve_alias(reg, "live") == os.path.abspath(idx2)  # unchanged

    # the resolved alias actually serves queries
    assert main(["query", "--index", al.resolve_alias(reg, "live"),
                 "--query", "spark join", "--top-k", "3"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) >= 1

    assert main(["alias", "delete", "--registry", reg, "--name", "live"]) == 0
    assert json.loads(capsys.readouterr().out) == {}
    with pytest.raises(KeyError):
        al.delete_alias(reg, "live")


def test_cli_dedup_modes(ray_session, tmp_path, capsys):
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["a b c d e f g h"] * 2 +            # exact dups
                         ["w x y z " * 4,
                          "p q r s t u v w x y z one two three",
                          "completely different text here now",
                          "another unique document body text"]),
    })
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(docs, str(src / "d.parquet"))

    for mode, minrows in (("exact", 5), ("line", 6), ("simhash", 6)):
        out = str(tmp_path / f"out_{mode}")
        assert main(["dedup", "--input", str(src), "--out", out, "--mode", mode]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["mode"] == mode and rec["rows"] >= minrows - 1

    # semdedup route (embeddings input)
    import numpy as np

    m = np.random.default_rng(4).standard_normal((40, 8)).astype(np.float32)
    m[1] = m[0] + 0.001  # planted near-dup
    emb = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([r for r in m.tolist()], pa.list_(pa.float32())),
    })
    esrc = tmp_path / "emb"
    esrc.mkdir()
    pq.write_table(emb, str(esrc / "e.parquet"))
    out = str(tmp_path / "out_sd")
    assert main(["dedup", "--input", str(src), "--embeddings", str(esrc),
                 "--out", out, "--mode", "semdedup", "--threshold", "0.95"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 40
    got = pq.read_table(out).to_pandas()
    assert int(got["keep"].sum()) < 40  # the planted pair collapsed


def test_cli_select_modes(ray_session, tmp_path, capsys):
    docs = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["the quick brown fox", "a dog in the house",
                          "der hund ist hier", "el gato esta aqui",
                          "le chien est la", "the cat is the best",
                          "und die katze auch", "is a the of and"]),
        "lang": pa.array(["en", "en", "de", "es", "fr", "en", "de", "fr"]),
    })
    src = tmp_path / "docs_sel"
    src.mkdir()
    pq.write_table(docs, str(src / "d.parquet"))
    out = str(tmp_path / "sel_dsir")
    assert main(["select", "--mode", "dsir", "--input", str(src),
                 "--out", out, "--target-lang", "en", "--n", "3"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 3
    got = pq.read_table(out).to_pandas()
    assert set(got.columns) == {"doc_id", "logw"}
    # only non-English docs are candidates
    assert set(got.doc_id) <= {2, 3, 4, 6, 7}

    import numpy as np

    emb = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array(
            np.random.RandomState(0).randn(40, 8).astype(np.float32).tolist(),
            pa.list_(pa.float32())),
    })
    esrc = tmp_path / "emb_sel"
    esrc.mkdir()
    pq.write_table(emb, str(esrc / "e.parquet"))
    out2 = str(tmp_path / "sel_proto")
    assert main(["select", "--mode", "prototype", "--input", str(esrc),
                 "--out", out2, "--keep-frac", "0.5"]) == 0
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["rows"] == 40
    got2 = pq.read_table(out2).to_pandas()
    assert got2.keep.mean() >= 0.5
