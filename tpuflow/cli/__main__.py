import sys

from tpuflow.cli.parser import main

sys.exit(main())
