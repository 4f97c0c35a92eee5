"""Run the cracks_tpu CLI forced onto the CPU backend.

(Plain JAX_PLATFORMS=cpu does not stick in this environment — the TPU
plugin wins unless jax.config is set before backend init.)  Usage:
    python scripts/vdrive_cpu.py <file.prm> [key=value ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
from cracks_tpu.__main__ import main
sys.exit(main(sys.argv[1:]))
