"""physher_tpu.parallel"""
