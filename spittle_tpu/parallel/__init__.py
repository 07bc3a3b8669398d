from .mesh import make_mesh, shard_params, whisper_param_specs

__all__ = ["make_mesh", "shard_params", "whisper_param_specs"]
