import sys

from esctp1raytracer_tpu.cli import main

sys.exit(main())
