"""``python -m georay <app> …`` — GDAL app-surface CLI (georay.cli)."""
import sys

from .cli import main

sys.exit(main())
