"""``python -m navierstokessolver_tpu`` runs the solver CLI (cli.main)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
