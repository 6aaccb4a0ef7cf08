"""Model operators (SURVEY §2.9 M1/M2) — numpy kernels wrapped by
Arrow-batched pandas UDFs. The only Python in the engine's hot path."""
