"""physher_tpu.models"""
