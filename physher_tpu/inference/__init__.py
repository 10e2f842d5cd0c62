"""physher_tpu.inference"""
