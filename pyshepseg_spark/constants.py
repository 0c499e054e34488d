"""Engine-wide constants.

Mirrors the reference's segment-ID conventions
(/root/reference/pyshepseg/shepseg.py:97-101) and tiling defaults
(/root/reference/pyshepseg/tiling.py:88-93), re-expressed for a
Spark engine where global segment IDs are int64 (uint32 overflows at
10^12-image scale; see SURVEY.md §1.1).
"""

import numpy as np

# Null segment ID and minimum valid ID (shepseg.py:100-101).
SEGNULLVAL = 0
MINSEGID = SEGNULLVAL + 1

# Local (per-tile) segment id dtype; global ids are int64.
SegIdType = np.uint32
GLOBAL_SEG_DTYPE = np.int64

# Cap on clump size during connected-component growth (shepseg.py:481).
# This is *semantics*, not just perf: oversized clumps are intentionally
# split, so it must be replicated exactly.
MAX_CLUMP_SIZE = 10000

# Reference tiling defaults (tiling.py:88-89,93). We default smaller
# because the fixture images are 512x512 (reference targets huge rasters).
DFLT_TILE_SIZE = 4096
DFLT_OVERLAP_SIZE = 1024
DFLT_STATS_TILE_SIZE = 1024

# Elimination pass cap (shepseg.py:979).
MAXPASSES = 10

# Stats layer: value used for stats of segments with no valid pixels
# (tilingstats.py:943-950).
MISSING_STATS_VALUE = -9999

# Fixture null value (reference runtests.py:236).
IMG_NULL_VAL = 65535
