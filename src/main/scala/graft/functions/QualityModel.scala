package graft.functions

/** Hashing-trick linear quality-classifier fixture (fastText shape:
  * Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"). Trained by tools/train_quality.py (deterministic
  * full-batch logistic regression, 5000 iters, lr 5.0) on the
  * sf0.01 documents table, label = (lang == 'en'); train accuracy
  * 0.6140, AUC 0.6502. Feature b of a doc = (count of tokens
  * hashing to bucket b) / n_tokens, bucket = md5-first-8-hex %% 64
  * over lowercased whitespace tokens — the corpus-standard md5 formula
  * ([[graft.operators.Sampling.hashBucket]]), so the DuckDB oracle
  * reproduces it bit-for-bit. Regenerate with the tool; do not edit.
  */
object QualityModel {
  val dim: Int = 64
  val bias: Double = -0.3254174269222345
  val weights: Array[Double] = Array(
    -3.792332810122906, -4.000645308299019, 0.0, 0.0, 0.0, -0.3434639607035214, 0.0, 0.0,
    0.0, 0.0, -0.7074718754690345, 0.0, 6.547270588502034, -0.4406580274884691, -1.230838889814738, 0.0,
    0.0, 0.0, 0.0, -2.8783264134140496, 0.0, 0.0, 0.1557094856731584, 5.290716596547367,
    0.0, -2.287828169728485, 0.0, -3.945831954548213, 0.0, 0.0, 6.712645965161113, 1.041124706281999,
    -3.5946147577971663, 0.0, 0.0, 0.0, 0.6822255309323283, 0.0, 0.0, -0.7928289158056743,
    0.0, 1.1524750635003118, 0.0, 0.0, 0.0, -2.369063168242986, 0.0, 0.0,
    -5.698251953916615, -2.3779709989115325, 0.0, 0.0, 0.0, 0.0, 0.0, 3.375226025170559,
    -3.898889944403465, 6.885545244145035, 3.1756121962219273, 0.0, 0.0, 3.015048319607754, 0.0, 0.0)
}
