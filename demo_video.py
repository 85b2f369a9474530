#!/usr/bin/env python
"""Entry: python demo_video.py --input_path video_or_frames_dir [...]."""
from smirk_tpu.cli.demo_video import main

if __name__ == "__main__":
    main()
