"""Path-based tabular ingest: Parquet / CSV / JSONL parity."""

import json

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

from duke_ray.sources.tables import read_tabular


def _rows():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta", "gamma", "delta eps"], pa.string()),
            "score": pa.array([10, 20, 30], pa.int64()),
        }
    )


def test_read_tabular_three_formats_agree(ray_session, tmp_path):
    t = _rows()
    pq.write_table(t, str(tmp_path / "d.parquet"))
    pacsv.write_csv(t, str(tmp_path / "d.csv"))
    with open(tmp_path / "d.jsonl", "w") as f:
        for r in t.to_pylist():
            f.write(json.dumps(r) + "\n")

    frames = {}
    for name in ("d.parquet", "d.csv", "d.jsonl"):
        df = (
            read_tabular(str(tmp_path / name))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(df.columns) == ["doc_id", "text", "score"]
        frames[name] = df
    assert frames["d.parquet"].equals(frames["d.csv"])
    assert frames["d.parquet"].equals(frames["d.jsonl"])


def test_read_tabular_column_pruning(ray_session, tmp_path):
    t = _rows()
    pq.write_table(t, str(tmp_path / "p.parquet"))
    with open(tmp_path / "p.jsonl", "w") as f:
        for r in t.to_pylist():
            f.write(json.dumps(r) + "\n")
    for name in ("p.parquet", "p.jsonl"):
        df = read_tabular(str(tmp_path / name), columns=["doc_id", "score"]).to_pandas()
        assert list(df.columns) == ["doc_id", "score"]
        assert sorted(df["score"]) == [10, 20, 30]
