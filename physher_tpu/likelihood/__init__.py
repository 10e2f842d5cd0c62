"""physher_tpu.likelihood"""
