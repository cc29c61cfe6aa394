"""``python -m mies_tpu`` == the CLI (also installed as ``mies-tpu``)."""

from mies_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
