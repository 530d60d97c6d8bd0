package graft.core

/** Salesforce record-id algebra: canonicalization of 15-char case-sensitive
  * ids to the 18-char case-insensitive form via the base-32 checksum suffix.
  *
  * Semantics match the reference implementation
  * (/root/reference/amaxa/amaxa.py:55-91): three 5-char chunks, each mapped
  * to one suffix char from `A..Z012345` by a bitmap of which positions are
  * uppercase. Golden vectors:
  * /root/reference/test/test_unit/test_SalesforceId.py:7-40.
  *
  * Pure Scala (no Spark dependency) so it is unit-testable and callable
  * from generated code (see [[graft.functions.CanonicalId]]).
  */
object SalesforceId {
  private final val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345"

  /** 15→18 expansion; 18-char ids pass through; anything else throws. */
  def canonicalize(raw: String): String = {
    val s = raw.trim
    s.length match {
      case 18 => s
      case 15 =>
        val sb = new java.lang.StringBuilder(18)
        sb.append(s)
        var i = 0
        while (i < 3) {
          var bits = 0
          var j = 0
          while (j < 5) {
            val c = s.charAt(i * 5 + j)
            if (c >= 'A' && c <= 'Z') bits |= 1 << j
            j += 1
          }
          sb.append(Alphabet.charAt(bits))
          i += 1
        }
        sb.toString
      case _ =>
        throw new IllegalArgumentException(
          "Salesforce Ids must be 15 or 18 characters.")
    }
  }

  /** Null-safe variant used by the Catalyst expression: invalid → null. */
  def canonicalOrNull(raw: String): String =
    if (raw == null) null
    else
      try canonicalize(raw)
      catch { case _: IllegalArgumentException => null }

  /** Equality on the canonical 18-char form (reference __eq__/__hash__). */
  def equivalent(a: String, b: String): Boolean = {
    val ca = canonicalOrNull(a); val cb = canonicalOrNull(b)
    ca != null && cb != null && ca == cb
  }

  /** 3-char key prefix → object-type routing key (reference api.py:63-70). */
  def keyPrefix(id: String): String =
    if (id == null || id.length < 3) null else id.substring(0, 3)
}
