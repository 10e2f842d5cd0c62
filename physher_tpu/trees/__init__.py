"""physher_tpu.trees"""
