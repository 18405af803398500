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
    * everything — deny-by-default, the safe direction for an ACL. The
    * `acl.contains(id)` membership check matters even when `datasources`
    * is empty (`forall` on Nil is vacuously true): a statement that
    * resolves no catalog names — `SELECT 1`, a constant-folded probe —
    * must still only run for identities the ACL actually knows, not for
    * any caller who asserts an arbitrary principal (r12 advice). */
  final case class AllowList(acl: Map[String, Set[String]])
      extends QueryAuthorizer {
    override def authorize(identity: Option[String],
        datasources: Seq[String]): Boolean =
      identity.exists(id =>
        acl.contains(id) && datasources.forall(acl(id).contains))
  }

  /** Conf-driven [[AllowList]] so the AUTHORIZING step deploys without
    * code: `spark.graft.auth.acl = "alice:ev|logs;bob:ev"` (identities
    * `;`-separated, each `identity:ds|ds|...`). An Engine constructed
    * with the default authorizer picks this up automatically; absent conf
    * = [[AllowAll]] (the single-tenant default). A present-but-malformed
    * ACL fails construction loudly — a typo'd ACL must never fall open. */
  def fromConf(spark: org.apache.spark.sql.SparkSession): QueryAuthorizer =
    spark.conf.getOption("spark.graft.auth.acl") match {
      case None => AllowAll
      case Some(raw) =>
        val acl = raw.split(';').iterator.map(_.trim).filter(_.nonEmpty)
          .map { entry =>
            entry.split(':') match {
              case Array(id, dss) =>
                id.trim -> dss.split('|').map(_.trim).filter(_.nonEmpty).toSet
              case _ => throw new IllegalArgumentException(
                s"spark.graft.auth.acl: expected 'identity:ds|ds', " +
                  s"got '$entry'")
            }
          }.toMap
        AllowList(acl)
    }
}

/** Shared-secret → principal map for token-mapped AUTHENTICATION at the
  * transport (the missing half of the reference's AUTHORIZING lifecycle,
  * `query/query-internal-procedure.md:68-96`): without it, identity is
  * CLIENT-ASSERTED — `Authorization: alice` impersonates alice whenever no
  * fronting authenticator rewrites the header. With
  * `spark.graft.auth.tokens = "s3cr3t:alice;t0k2:bob"` armed, the HTTP
  * layer resolves the header (bare token or `Bearer <token>`) through this
  * map and REJECTS anything else with 403 — an armed ACL is then keyed by
  * principals only this process's secrets can assert.
  *
  * Deployment posture (the engine WARNs about both at startup): the HTTP
  * surface is plaintext, so tokens transit in the clear unless a fronting
  * TLS terminator covers the hop; and the map lives in Spark conf, so conf
  * dumps (the Spark UI environment page, event logs with conf capture)
  * expose it — treat the conf as secret material. Token matching is
  * constant-time (`MessageDigest.isEqual` per configured token), not a
  * short-circuiting map lookup. */
object AuthTokens {
  /** None = not armed (legacy verbatim principal forwarding). A
    * present-but-malformed value fails loudly — and the error NEVER echoes
    * the entry, which may be a half-typed secret. */
  def fromConf(spark: org.apache.spark.sql.SparkSession)
      : Option[Map[String, String]] =
    spark.conf.getOption("spark.graft.auth.tokens").map { raw =>
      val entries = raw.split(';').iterator.map(_.trim).filter(_.nonEmpty)
        .map { entry =>
          val i = entry.indexOf(':')
          if (i <= 0 || i == entry.length - 1)
            throw new IllegalArgumentException(
              "spark.graft.auth.tokens: expected 'token:identity' entries " +
                "(entry value withheld — it may contain a secret)")
          entry.substring(0, i).trim -> entry.substring(i + 1).trim
        }.toMap
      if (entries.isEmpty) throw new IllegalArgumentException(
        "spark.graft.auth.tokens is set but holds no entries")
      entries
    }

  /** The token inside an `Authorization` header: RFC 6750 `Bearer <token>`
    * or the bare value. */
  def tokenOf(header: String): String =
    if (header.regionMatches(true, 0, "Bearer ", 0, 7)) header.substring(7).trim
    else header
}
