"""Thin spark-submit application script.

Usage (cluster):
    tools/make_pyfiles_zip.py dist/skewer_spark.zip
    spark-submit --master yarn --num-executors N \
        --py-files dist/skewer_spark.zip run_job.py \
        --input s3://.../transcripts --out s3://.../skewer_out --buckets 4096

The package itself arrives via ``--py-files``; this file only dispatches
to ``skewer_spark.__main__`` so it works from any working directory.
"""

import sys

from skewer_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
