"""``python -m solarpos_spark`` — the reference-compatible CLI entry point."""

from .cli import main

raise SystemExit(main())
