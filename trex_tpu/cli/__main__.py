"""`python -m trex_tpu.cli` entry point."""

from trex_tpu.cli.parser import main

if __name__ == "__main__":
    main()
