package graft.engine

/** The pinned seeded-determinism digests for [[GateChecks]], isolated
  * in one generated-looking file so re-pinning (run
  * `graft.tools.GateDigests`, paste its block here) never touches the
  * enforcement logic. Key: (query name, sf-dir basename). Values are
  * [[GateChecks.digestOf]] over the gate row's output frame at that
  * scale factor on the driver's testdata. */
private[engine] object PinnedDigests {
  val all: Map[(String, String), String] = Map(
    ("q32_kmeans", "sf0.001") -> "a4aad11ab4b6af0a8336386250de6d2e",
    ("q40_quality_model", "sf0.001") -> "39f256db249027b6ac358dd3217e0855",
    ("q41_ann_lsh", "sf0.001") -> "76622a787f377eccb2e79c788d9cd0f5",
    ("q47_simhash_wide", "sf0.001") -> "e6077cc9fe8eee2975386700e62ba822",
    ("q48_embed_lsh_neardup", "sf0.001") -> "21a3cb40556c618792918afdd7965054",
    ("q49_tfidf_vectors", "sf0.001") -> "c535266ac319c8deab1ca79f4301515a",
    ("q82_semantic_dedup", "sf0.001") -> "2f3b67d1db7a7b79eaf99d3a6db70f74",
    ("q85_semantic_keep_best", "sf0.001") -> "58ab27f2a440b0662af7a150f2821c89",
    ("q88_isolation_forest", "sf0.001") -> "bf1a0c3d2b6b09c658f72049459f3ef7",
    ("q32_kmeans", "sf0.01") -> "87bb43b24c7021c61b948cea0f3512bc",
    ("q40_quality_model", "sf0.01") -> "ea2cba5afcbafddde4cf007c47b8fcfc",
    ("q41_ann_lsh", "sf0.01") -> "0f0ce9a0c83f1ae56621c45c4e5a10d9",
    ("q47_simhash_wide", "sf0.01") -> "854a7f9897ea75dc04dc1a255e48af8c",
    ("q48_embed_lsh_neardup", "sf0.01") -> "50c70a6f6b597ecde6a6e9b449620150",
    ("q49_tfidf_vectors", "sf0.01") -> "13dc52315fec5f8e2026c870691c4f14",
    ("q82_semantic_dedup", "sf0.01") -> "95900e47ba3d3104e9d74ed71092ec00",
    ("q85_semantic_keep_best", "sf0.01") -> "54f6de53a4466829777b4f56eed983aa",
    ("q88_isolation_forest", "sf0.01") -> "45947c11fea8e3a776c5e9598bce0d32",
    ("q32_kmeans", "sf0.1") -> "4537d356af7a9344a30cf5dc7028f3ae",
    ("q40_quality_model", "sf0.1") -> "afb7db0a70a35d5720e0fa98f8918280",
    ("q41_ann_lsh", "sf0.1") -> "3b3f7363a09246efd07a604344292134",
    ("q47_simhash_wide", "sf0.1") -> "5a343a78624599e604e863378b6d17a1",
    ("q48_embed_lsh_neardup", "sf0.1") -> "51c44ece9a1945ac35ec2171333b7a29",
    ("q49_tfidf_vectors", "sf0.1") -> "407a838f258af4915a0af3ee81d879ac",
    ("q82_semantic_dedup", "sf0.1") -> "5f14f2538f6e2ca0af03c693c2805f7c",
    ("q85_semantic_keep_best", "sf0.1") -> "d26c621078921c34fb29384f67c1b5c5",
    ("q88_isolation_forest", "sf0.1") -> "f5f1344d8ea8c0b294881380b5ecd39e",
  )
}
