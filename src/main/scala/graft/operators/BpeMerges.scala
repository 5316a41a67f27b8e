package graft.operators

/** A pre-trained BPE merge table shipped as constants — the production
  * shape for ENCODING (the tokenizer artifact is trained once by
  * [[Bpe.bpeTrain]] and then distributed as a literal list, the
  * same pattern as [[IvfQuantizer]] / [[PqCodebooks]]). These eight
  * merges are `bpeTrain`'s output on the sf0.01 documents fixture; any
  * fixed rank-ordered list works.
  */
object BpeMerges {
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("s", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar")
  )
}
