"""Name-parity alias for the reference's ``example/molbe_ppp.py``.

Despite its legacy "ppp" filename the reference example is the thiophene
dimer BE2/6-31G IAO workflow (ref example/molbe_ppp.py:8-40), not a
Pariser-Parr-Pople model Hamiltonian; the faithful mirror lives in
``molbe_thiophene_iao.py``.  (Custom-``hcore`` BE entry, the other thing
the "ppp" name suggests, is demonstrated in
``molbe_oneshot_rbe_hcore.py``.)  This file just runs the mirror so the
reference's example list maps one-to-one onto this directory.
"""

import runpy
from pathlib import Path

runpy.run_path(str(Path(__file__).parent / "molbe_thiophene_iao.py"))
