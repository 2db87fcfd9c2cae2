"""spark-submit entry script (the package itself rides in via
--py-files):

    python scripts/package.py
    spark-submit --master local[8] \
        --conf spark.sql.shuffle.partitions=8 \
        --py-files dist/jsf_spark.zip \
        scripts/submit_job.py gen --rows 100000 --out /tmp/pages
    spark-submit --py-files dist/jsf_spark.zip scripts/submit_job.py \
        run --pages /tmp/pages --out /tmp/out --severity CRITICAL

Delegates to juniper_syslog_filter_spark.__main__ — identical CLI to
``python -m juniper_syslog_filter_spark`` (the reference's run.py /
run_with_args.py knobs).
"""

from __future__ import annotations

import sys

from juniper_syslog_filter_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
