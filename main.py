#!/usr/bin/env python
"""spark-submit entrypoint (north_rule: ships via --py-files).

Usage:
    scripts/package.sh                       # builds dist/pipeline.zip
    spark-submit --master <...> \
        --py-files dist/pipeline.zip main.py \
        [--input <parquet|documents:DIR|fixtures>] \
        <report|stats|check|ignore|ignored|cleanup> [options]

The same CLI runs in-process via `python -m cargo_dupes_spark.cli`; this
thin wrapper exists so the package resolves from the shipped zip on a real
multi-executor cluster.
"""

import sys

from cargo_dupes_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
