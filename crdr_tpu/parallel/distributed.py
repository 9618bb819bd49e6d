"""Multi-host initialization (TPU pods over DCN).

The reference is single-process; this utility brings up `jax.distributed` so
the DP/SP meshes in this package span hosts: each host runs the same program,
jax.devices() shows the global device set, and the Mesh helpers in
parallel/mesh.py work unchanged (XLA routes collectives over ICI within a
slice and DCN across slices).
"""

from __future__ import annotations

import os
from typing import Optional

from ..utils.logger import get_root_logger


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     init_timeout: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata when
    on Cloud TPU).  Returns True when multi-process mode is active."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")

    logger = get_root_logger()
    try:
        if coordinator_address:
            kw = ({"initialization_timeout": init_timeout}
                  if init_timeout else {})
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id, **kw)
        else:
            # Cloud TPU pods auto-discover via metadata; single host no-ops
            jax.distributed.initialize()
    except Exception as e:
        if coordinator_address:
            # The pod was EXPLICITLY configured: a silent fall-back to
            # single-host would train on 1/N of the data with no warning.
            raise RuntimeError(
                f"jax.distributed.initialize failed for explicitly "
                f"configured pod (coordinator={coordinator_address}, "
                f"num_processes={num_processes}, process_id={process_id})"
            ) from e
        logger.debug(f"jax.distributed not initialized ({e}); single host")
        return False
    logger.info(f"distributed: process {jax.process_index()} / "
                f"{jax.process_count()}, {jax.device_count()} devices")
    return jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
