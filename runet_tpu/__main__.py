import sys

from runet_tpu.cli import main

# Propagate command return codes (doctor / serve --once report failure as
# nonzero); commands returning None exit 0.
sys.exit(main())
