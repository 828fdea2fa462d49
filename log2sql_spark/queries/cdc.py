"""CDC (binlog → SQL) query registrations. Populated in M2."""
