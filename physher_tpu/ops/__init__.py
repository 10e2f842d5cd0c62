"""physher_tpu.ops"""
