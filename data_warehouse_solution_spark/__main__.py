"""``python -m data_warehouse_solution_spark`` — see ``cli.py``."""

from .cli import main

raise SystemExit(main())
