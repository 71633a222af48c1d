"""``python -m cryptopulse_real_time_arbitrage_detection_lakehouse_spark``."""

import sys

from .cli import main

sys.exit(main())
