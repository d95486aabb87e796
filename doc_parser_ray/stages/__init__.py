"""Ray Data stage wrappers: batch UDFs and actor-pool callables."""
