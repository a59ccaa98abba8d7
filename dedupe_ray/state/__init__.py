from dedupe_ray.state.checkpoint import CheckpointedRun  # noqa: F401
