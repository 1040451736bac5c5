import sys

from vulkanraytracing_tpu.app.cli import main

sys.exit(main())
