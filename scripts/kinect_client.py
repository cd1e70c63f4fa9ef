#!/usr/bin/env python
"""Headless kinect_client (TPU build). Usage:

  python scripts/kinect_client.py <scene.ks> [run.conf] [options]

Options mirror the reference binary (-p server socket, -d display size, -f
feedback socket, ...) plus headless extensions (--recordings, --outdir,
--dump-every, --dump-textures, --frames). See rgbd_recon_tpu/app.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgbd_recon_tpu.app import main

if __name__ == "__main__":
    raise SystemExit(main())
