"""spark-submit driver for pdfsearch_spark (shipped next to the --py-files zip)."""
import sys

from pdfsearch_spark.cli import main

sys.exit(main())
