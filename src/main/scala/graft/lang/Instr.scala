package graft.lang

/** Normalized 7-instruction IR and the pattern desugarer, semantics per the
  * reference (/root/reference/graphDB/lib/instr.ml:8-98).
  *
  * Desugaring ordering rule (instr.ml:56-77, observable through node-id
  * assignment order): each relation instruction is emitted immediately
  * AFTER the node instruction that declares its target, so creates happen
  * before edge-adds. `(a:A)-[:r]->(b:B)-[:s]->(c)` ⇒
  * `[node a; node b; rel(a,r,b); node c?; rel(b,s,c)]`.
  */
sealed trait Act extends Product with Serializable
case object CreateAct extends Act
case object MatchAct extends Act

sealed trait Instruction extends Product with Serializable
final case class IActOnNode(act: Act, v: String, label: String) extends Instruction
final case class IActOnRel(act: Act, sv: String, rel: String, tv: String) extends Instruction
final case class IDeleteNode(v: String) extends Instruction
final case class IDeleteRel(sv: String, rel: String, tv: String) extends Instruction
final case class IReturn(vs: List[String]) extends Instruction
final case class IWhere(e: Expr) extends Instruction
final case class ISet(v: String, field: String, e: Expr) extends Instruction

final case class NormProg(types: GraphTypes, instrs: List[Instruction])

object Normalize {

  private def normNodePattern(act: Act, np: NodePattern): List[Instruction] = np match {
    case DeclPattern(v, l)  => List(IActOnNode(act, v, l))
    case VarRefPattern(_)   => Nil
  }

  private def normPattern(act: Act, pat: Pattern): List[Instruction] = pat match {
    case SimpPattern(np) => normNodePattern(act, np)
    case CompPattern(np, rl, rest) =>
      normNodePattern(act, np) ++ tail(act, np.variable, rl, rest)
  }

  private def tail(act: Act, srcV: String, rl: String, pat: Pattern): List[Instruction] =
    pat match {
      case SimpPattern(np) =>
        normNodePattern(act, np) :+ IActOnRel(act, srcV, rl, np.variable)
      case CompPattern(np, rl2, rest) =>
        (normNodePattern(act, np) :+ IActOnRel(act, srcV, rl, np.variable)) ++
          tail(act, np.variable, rl2, rest)
    }

  private def normClause(c: Clause): List[Instruction] = c match {
    case Create(pats)             => pats.flatMap(normPattern(CreateAct, _))
    case Match(pats)              => pats.flatMap(normPattern(MatchAct, _))
    case Delete(DeleteNodes(vs))  => vs.map(IDeleteNode)
    case Delete(DeleteRels(ts))   => ts.map { case (s, r, t) => IDeleteRel(s, r, t) }
    case SetClause(as)            => as.map { case (v, f, e) => ISet(v, f, e) }
    case Where(e)                 => List(IWhere(e))
    case Return(vs)               => List(IReturn(vs))
  }

  def normalize(p: Prog): NormProg =
    NormProg(p.types, p.query.clauses.flatMap(normClause))
}
