"""longspec-tpu: TPU-native long-context speculative decoding framework.

Re-design of sail-sg/LongSpec's capabilities (see SURVEY.md / PARITY.md)
in JAX/XLA/Pallas. Public surface:

    from longspec_tpu import SpecEngine, ModelConfig, DraftConfig, EngineConfig
    eng = SpecEngine(params, draft_params, cfg)
    out = eng.tree_spec_generate(input_ids, prompt_lens, max_gen_len=1024)
"""
from .config import (ModelConfig, DraftConfig, EngineConfig,  # noqa: F401
                     llama2_7b, llama2_13b, llama3_8b, qwen2_32b, tiny_test)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing the engine pulls in jax; keep `import longspec_tpu`
    # cheap for config-only users (collators, expconfig, mathx).
    if name == "SpecEngine":
        from .engine.engine import SpecEngine
        return SpecEngine
    if name == "DecodeState":
        from .engine.engine import DecodeState
        return DecodeState
    raise AttributeError(name)
