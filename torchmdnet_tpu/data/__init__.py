from torchmdnet_tpu.data.batch import AtomicBatch, pad_molecules  # noqa: F401
