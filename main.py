#!/usr/bin/env python
"""Launcher (reference-parity entry point: python main.py --hoi_path ...)."""
from rlipv2_tpu.cli import main

if __name__ == "__main__":
    main()
