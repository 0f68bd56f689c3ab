"""Hadoop FileSystem seam (fs.py): the driver-side path ops behind the
sinks and ledgers, exercised with both plain local paths and explicit
file:// URIs (the stand-in for hdfs://-style warehouses)."""

from __future__ import annotations

import pytest

from harvesting_validator_spark import fs


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_roundtrip_path_ops(spark, tmp_path, scheme):
    root = f"{scheme}{tmp_path}"
    f1 = fs.join(root, "a", "x.txt")
    assert f1 == f"{root}/a/x.txt"

    assert not fs.exists(spark, f1)
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.txt").write_text("hello")
    assert fs.exists(spark, f1)
    assert fs.file_size(spark, f1) == 5
    assert fs.listdir(spark, fs.join(root, "a")) == ["x.txt"]

    fs.rename(spark, f1, fs.join(root, "a", "y.txt"))
    assert not (tmp_path / "a" / "x.txt").exists()
    assert (tmp_path / "a" / "y.txt").read_text() == "hello"

    assert fs.delete(spark, fs.join(root, "a", "y.txt"))
    assert not fs.exists(spark, fs.join(root, "a", "y.txt"))


def test_rename_failure_raises(spark, tmp_path):
    with pytest.raises(IOError):
        fs.rename(
            spark,
            f"{tmp_path}/missing-src",
            f"{tmp_path}/missing-dst",
        )


def test_join_strips_duplicate_slashes():
    assert fs.join("hdfs://nn:8020/wh/", "t", "p.parquet") == (
        "hdfs://nn:8020/wh/t/p.parquet"
    )
    assert fs.join("s3a://bucket/prefix", "x") == "s3a://bucket/prefix/x"
