"""`python -m gpu_ray_tracing_tpu` entry point."""

import sys

from gpu_ray_tracing_tpu.cli import main

sys.exit(main())
