from llama32mm_tpu.utils.kvcache import KVCache, init_kv_cache, update_layer_cache

__all__ = ["KVCache", "init_kv_cache", "update_layer_cache"]
