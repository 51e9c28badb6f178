import sys

from resnet_accel_tpu.cli import main

sys.exit(main())
