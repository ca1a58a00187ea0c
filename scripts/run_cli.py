"""spark-submit-able entry point for the CLI (deploy.sh smoke step).

``spark-submit`` runs a *file*, not a ``-m`` module — this shim adds
the repo root to sys.path and forwards argv to
``aws_iceberg_automation_spark.cli.main``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_iceberg_automation_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
