"""Pure numpy sketch kernels (no Spark imports allowed in this package)."""

from . import bits, bloom, countish, countmin, hll, jmphash, kll, tdigest  # noqa: F401
