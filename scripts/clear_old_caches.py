#!/usr/bin/env python
"""Repo-local shim for the cache maintenance CLI — the logic lives in
dbfs_spark_cache_spark.maintenance_cli (installed as the
`spark-cache-maintenance` console script); this path form needs no
install step. See that module's docstring for usage."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbfs_spark_cache_spark.maintenance_cli import main

if __name__ == "__main__":
    sys.exit(main())
