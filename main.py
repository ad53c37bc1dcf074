#!/usr/bin/env python
"""Experiment runner: `python main.py -c config.json` or `-f config_folder/`.

Same CLI surface as the reference entry point (reference main.py:48-67).
"""
import sys

from gaot_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
