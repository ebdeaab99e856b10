import sys

from readbouncer_tpu.main import main

sys.exit(main())
