"""physher_tpu.config"""
