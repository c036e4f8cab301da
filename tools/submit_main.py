"""Primary file for the north rule's ``spark-submit --py-files`` invocation.

``progquery_spark/run.py`` is a package module (relative imports), so the
cluster entry point is this shim — the package itself ships in the zip:

    python tools/build_zip.py dist/progquery_spark.zip
    spark-submit --master <cluster> --py-files dist/progquery_spark.zip \\
        tools/submit_main.py --input <sf_dir> --warehouse <wh>

spark-submit places ``--py-files`` archives on the driver's and every
executor's PYTHONPATH, so ``import progquery_spark`` resolves from the zip
with no repo checkout on the cluster (SURVEY.md §2.1 S1).
"""

import sys

from progquery_spark.run import main

if __name__ == "__main__":
    sys.exit(main())
