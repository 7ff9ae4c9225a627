"""SparkSession construction with fail-fast config validation.

Reference parity: ``get_env_variable`` at ``pipeline.py:19-24`` hard-exits
when required config is missing; we validate a config dataclass before
building the session instead (no module-level side effects — the
reference's import-time I/O at ``pipeline.py:36-69`` is an anti-pattern
its own tests fight with, see ``tests/test_pipeline.py:6``).

Scale notes (100 TB design): every knob here is a default tuned for the
local[32] test harness but chosen so the same code is correct on a
1000-executor cluster — AQE handles runtime partition coalescing and
skew joins, shuffle partitions are overridable per-deployment, and the
session timezone is pinned UTC so results are cluster-invariant.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

_REQUIRED_KEYS = ("app_name", "master")


@dataclass
class EngineConfig:
    """Validated engine configuration (replaces the reference's .env
    loading, ``pipeline.py:36-52``; missing values fail fast like
    ``get_env_variable``, but with an exception instead of exit())."""

    app_name: str = "data_warehouse_solution_spark"
    master: str = os.environ.get("SPARK_GRAFT_MASTER", "")
    shuffle_partitions: int = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    session_timezone: str = "UTC"
    driver_memory: str = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.master:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            self.master = f"local[{cpus}]"
        for key in _REQUIRED_KEYS:
            if not getattr(self, key):
                raise ValueError(f"Missing required engine config: {key}")


def build_session(config: EngineConfig | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    AQE on: runtime partition coalescing, skew-join splitting, and
    dynamic join-strategy switching are what make one static plan
    survive a 100x scale-up. Arrow on: every pandas-UDF extension
    operator ships columnar batches, not pickled rows.
    """
    cfg = config or EngineConfig()
    builder = (
        SparkSession.builder.appName(cfg.app_name)
        .master(cfg.master)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", cfg.session_timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", cfg.driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in cfg.extra.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    logger.info("SparkSession ready: master=%s app=%s", cfg.master, cfg.app_name)
    return spark


def get_session() -> SparkSession:
    """Return the active session, building a default one if needed."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
