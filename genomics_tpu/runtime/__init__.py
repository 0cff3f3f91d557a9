"""Runtime layer: bucketed batched dispatch (the CDP replacement),
native traceback decode, async result staging."""

from genomics_tpu.runtime.dispatch import AlignEngine, AlignmentJob  # noqa: F401
