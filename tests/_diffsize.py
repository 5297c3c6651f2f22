"""Differential-corpus size budget.

The engine-in-the-loop differential tests (reference CSVLinter or
TabularLinter on one side, Spark per trial) dominate the suite wall time
(~35 of ~55 min at full size). The default is a trimmed budget that keeps
every generator and every check in the loop; set SPARK_GRAFT_FULL_DIFF=1
to restore the full corpus sizes (used for release sweeps / after touching
rules/, functions/, or sources/). Because each test draws trials from a
single seeded rng stream, the fast set is a strict prefix of the full set —
fast-green is never a different corpus, just a shorter one.

The pure-Python differentials (KernelLinter vs reference, no Spark) are
cheap and always run at full size.
"""

import os

FULL = os.environ.get("SPARK_GRAFT_FULL_DIFF") == "1"


def diff_trials(fast: int, full: int) -> int:
    return full if FULL else fast
