#!/usr/bin/env python
"""Entry: python demo.py --input_path img.png --checkpoint ckpt [--crop ...]."""
from smirk_tpu.cli.demo import main

if __name__ == "__main__":
    main()
