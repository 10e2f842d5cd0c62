"""physher_tpu.utils"""
