"""Pipeline plans: staged, checkpointed, resumable compositions of operators."""
