"""Device ops: Pallas/XLA kernels and their host (numpy) counterparts."""
