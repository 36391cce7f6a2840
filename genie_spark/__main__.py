"""``python -m genie_spark`` entry point (reference genie/__main__.py)."""
import sys

from genie_spark.cli import main

sys.exit(main())
