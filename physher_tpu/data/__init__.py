"""physher_tpu.data"""
