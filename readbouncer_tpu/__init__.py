"""readbouncer_tpu — a TPU-native adaptive-sampling read classification framework.

A from-scratch rebuild of the capabilities of ReadBouncer
(Ulrich et al., Bioinformatics 2022; reference C++ tree mounted at
/root/reference) designed TPU-first:

* The Interleaved Bloom Filter (IBF) is an HBM/VMEM-resident uint32 bit
  matrix queried by a fused XLA/Pallas kernel
  (k-mer encode -> h hashes -> row gather -> AND -> per-bin count).
* The basecaller is a batched JAX GRU (`lax.scan` over signal frames,
  MXU matmuls) loading the reference's DeepNano-blitz weight files.
* The live adaptive-sampling pipeline is a host scheduler feeding
  fixed-shape device batches instead of busy-spinning thread queues.
* Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map`:
  read batches are data-parallel, large filters are bin-sharded with
  `psum`/concat merges over ICI.

Subcommand surface mirrors the reference (`build`, `classify`, `target`,
`test`), driven by the same TOML config schema
(reference: src/config/configReader.cpp:59-439).
"""

__version__ = "0.1.0"

from readbouncer_tpu.config import ConfigReader  # noqa: F401
