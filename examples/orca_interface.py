"""Ingest an ORCA mean field (ref example/orca_interface.py): MOs are
parsed from ORCA's JSON property export, reordered and sign-fixed from
ORCA's AO convention (f/g/h phase flips) to ours, ready to seed a BE
run in place of an internally converged SCF.
"""

from quemb_tpu.mf_interfaces import load_orca_json

d = load_orca_json("tests/data/h2o_cc-pvqz_orca.json")
print("n atoms:", len(d["atoms"]))
print("occupations:", d["mo_occ"][:8])
print("MO matrix:", d["mo_coeff"].shape)
