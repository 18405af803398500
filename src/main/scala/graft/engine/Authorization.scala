package graft.engine

/** Per-datasource READ authorization — the AUTHORIZING step of the
  * reference's query lifecycle (reference
  * `query/query-internal-procedure.md:68-96`: initialize → authorize →
  * execute → log, with `ForbiddenException` on deny): every datasource a
  * query touches must pass a READ check BEFORE any execution or cache
  * read, and a deny surfaces as the documented error shape over HTTP 403.
  *
  * `identity` is the opaque caller principal the transport extracted (the
  * HTTP layer forwards the `Authorization` header verbatim — this engine
  * deliberately does not parse credential formats; an authenticator that
  * does can sit in front and rewrite the header to a principal name).
  */
trait QueryAuthorizer {
  /** Whether `identity` may READ every datasource in `datasources`. */
  def authorize(identity: Option[String], datasources: Seq[String]): Boolean
}

object QueryAuthorizer {

  /** Single-tenant default: everything allowed — the engine's behavior
    * before the hook existed, and the sandbox-appropriate default. */
  object AllowAll extends QueryAuthorizer {
    override def authorize(identity: Option[String],
        datasources: Seq[String]): Boolean = true
  }

  /** Static allow-list: `acl(identity)` = the datasources that identity
    * may read. Unknown identities (and anonymous callers) are denied
    * everything — deny-by-default, the safe direction for an ACL. */
  final case class AllowList(acl: Map[String, Set[String]])
      extends QueryAuthorizer {
    override def authorize(identity: Option[String],
        datasources: Seq[String]): Boolean =
      identity.exists(id =>
        datasources.forall(acl.getOrElse(id, Set.empty).contains))
  }
}
