"""Table IO: synthetic page corpus + snapshot-checkpointed tables."""
