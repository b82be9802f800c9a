"""Sources: the distributed PBF scan and helpers for the testdata tables."""
