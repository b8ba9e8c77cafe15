from semi_supervised_vos_tpu.infer.engine import (  # noqa: F401
    BankState,
    EngineConfig,
    PropagationEngine,
)
