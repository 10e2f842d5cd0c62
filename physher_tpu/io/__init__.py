"""physher_tpu.io"""
