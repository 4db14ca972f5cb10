"""Local materialization cache for the extracted wide-metadata table.

The driver invokes each query in isolation; re-running corpus synthesis +
extraction per query would redo identical work, so the wide DataFrame is
materialized once per (sf_dir, code-version) to parquet under /tmp — the
local stand-in for the Iceberg table the production pipeline would maintain
(write-once, partitioned, schema-stable).  The cache key includes a content
hash of the kernel/spec sources, so ANY semantic change invalidates it.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from gmx import pipeline

_KERNEL_FILES = (
    "corpus.py", "extract.py", "serialize.py", "pipeline.py", "schema.py", "xmlkit.py",
    "specs/model.py", "specs/fgdc.py", "specs/iso.py", "specs/arcgis.py",
)


def _code_version() -> str:
    h = hashlib.md5()
    root = Path(__file__).parent
    for rel in _KERNEL_FILES:
        h.update((root / rel).read_bytes())
    return h.hexdigest()[:12]


def cache_root() -> Path:
    return Path(os.environ.get("GMX_CACHE_DIR", "/tmp/gmx-cache"))


def cached_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide metadata DataFrame for ``sf_dir``, materialized once."""

    if os.environ.get("GMX_NO_CACHE"):
        return pipeline.metadata_df(spark, sf_dir)

    key = f"{Path(sf_dir).name}-{_code_version()}"
    path = cache_root() / key / "metadata.parquet"
    if not (path / "_SUCCESS").exists():
        tmp = path.with_suffix(".tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        pipeline.metadata_df(spark, sf_dir).write.mode("overwrite").parquet(str(tmp))
        path.parent.mkdir(parents=True, exist_ok=True)
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)
    return spark.read.parquet(str(path))
