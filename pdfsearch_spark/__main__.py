"""``python -m pdfsearch_spark`` entry point."""

import sys

from .cli import main

sys.exit(main())
