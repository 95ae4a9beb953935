"""Public CLI entry points mirroring the reference scripts:

  python -m mst_tpu.cli.train                      <- src/train.py
  python -m mst_tpu.cli.train_style_transfer       <- src/train_style_transfer.py
  python -m mst_tpu.cli.inference_e2e_style_transfer <- inference/inference_e2e_style_transfer.py
  python -m mst_tpu.cli.validate_retrieval         <- inference/validate_retrieval.py
  python -m mst_tpu.cli.preprocess_separation      <- scripts/preprocess_fma_separation_fast.py
"""
