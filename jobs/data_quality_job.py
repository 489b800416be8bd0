#!/usr/bin/env python
"""spark-submit wrapper: `spark-submit --py-files outrank_spark.zip
jobs/data_quality_job.py --input /tables/pages --rules rules.json` —
see outrank_spark/jobs/data_quality.py for the full CLI surface."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outrank_spark.jobs.data_quality import main

if __name__ == "__main__":
    sys.exit(main())
