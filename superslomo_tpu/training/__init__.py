"""Training subsystem: train state, optimizer/schedule, checkpointing,
PyTorch weight conversion, and the trainer driver."""
