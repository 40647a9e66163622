package graft.jql

/** JQL tokenizer. Quoted strings support JIRA's doubled-quote escape
  * (`"a ""b"" c"`), mirroring the reference's quote-balance validator
  * (reference: pkg/jql/builder.go:292-321).
  */
object Lexer {
  sealed trait Tok { def pos: Int }
  final case class TWord(s: String, pos: Int) extends Tok // bare word / number / reldate
  final case class TStr(s: String, pos: Int) extends Tok // quoted literal
  final case class TOp(s: String, pos: Int) extends Tok // = != ~ !~ > >= < <=
  final case class TPunct(s: String, pos: Int) extends Tok // ( ) , [ ]
  final case class TEof(pos: Int) extends Tok

  private val wordChars: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet ++ "_-.@#*+/".toSet

  def tokenize(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (input(i) == quote) {
            if (i + 1 < n && input(i + 1) == quote) { sb += quote; i += 2 } // doubled-quote escape
            else { closed = true; i += 1 }
          } else { sb += input(i); i += 1 }
        }
        if (!closed) throw JqlParseException("unbalanced quote", start)
        out += TStr(sb.toString, start)
      } else if (c == '!' && i + 1 < n && (input(i + 1) == '=' || input(i + 1) == '~')) {
        out += TOp(s"!${input(i + 1)}", i); i += 2
      } else if ((c == '>' || c == '<') && i + 1 < n && input(i + 1) == '=') {
        out += TOp(s"$c=", i); i += 2
      } else if (c == '=' || c == '~' || c == '>' || c == '<') {
        out += TOp(c.toString, i); i += 1
      } else if (c == '(' || c == ')' || c == ',' || c == '[' || c == ']') {
        out += TPunct(c.toString, i); i += 1
      } else if (wordChars(c)) {
        val start = i
        while (i < n && wordChars(input(i))) i += 1
        out += TWord(input.substring(start, i), start)
      } else throw JqlParseException(s"unexpected character '$c'", i)
    }
    out += TEof(n)
    out.result()
  }
}
