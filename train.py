#!/usr/bin/env python
"""Entry: python train.py <config.yaml> [key=value ...] [--synthetic]."""
from smirk_tpu.cli.train import main

if __name__ == "__main__":
    main()
