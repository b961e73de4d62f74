import sys

from jpeg_gpu_tpu.cli import main

sys.exit(main())
