"""PINNED quality-classifier weights: ops/quality_model.py:train_logistic
output at sf0.01 on labeled_quality_corpus (clean vs repeated-junk; train
accuracy 1.000, final loss 0.2674). Regenerate with
tools/pin_quality_model.py."""

# feature order: bias, stop_en, stop_fr, stop_de, stop_es, mean_tok_len, ttr
WEIGHTS = [
    -1.1251228724097304,
    -0.10539423524263461,
    -0.028281818656372065,
    0.0,
    -0.028281818656372065,
    -0.1306416595359984,
    6.39935313389919,
]
