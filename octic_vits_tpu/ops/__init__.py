from octic_vits_tpu.ops.gelu_d8 import gelu_d8, gelu_d8_eager
