"""Package entry point: ``python -m tetraear_tpu`` (mirrors
tetraear/__main__.py -> ui main)."""

from tetraear_tpu.ui.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
