package graft.meta

/**
 * STAC Collection metadata value classes (reference: metadata.py:55-330;
 * stored tables geodb.sql:1697-1762). Validation mirrors the reference:
 * provider roles restricted to the PostgreSQL enum licensor|producer|
 * processor|host (geodb.sql:1691).
 */
object Stac {
  val ValidProviderRoles = Set("licensor", "producer", "processor", "host")

  case class Provider(name: String, description: String = "",
                      roles: Seq[String] = Seq.empty, url: String = "") {
    require(roles.forall(ValidProviderRoles.contains),
      s"Invalid set of roles provided: $roles; valid roles are: $ValidProviderRoles.")
    def toMap: Map[String, Any] = Map(
      "name" -> name, "description" -> description,
      "roles" -> roles, "url" -> url)
  }

  case class Link(rel: String, href: String, linkType: String = "",
                  title: String = "") {
    def toMap: Map[String, Any] = Map(
      "rel" -> rel, "href" -> href, "type" -> linkType, "title" -> title)
  }

  case class Asset(href: String, title: String = "", description: String = "",
                   mediaType: String = "", roles: Seq[String] = Seq.empty) {
    def toMap: Map[String, Any] = Map(
      "href" -> href, "title" -> title, "description" -> description,
      "type" -> mediaType, "roles" -> roles)
  }

  case class ItemAsset(title: String = "", description: String = "",
                       mediaType: String = "", roles: Seq[String] = Seq.empty) {
    def toMap: Map[String, Any] = Map(
      "title" -> title, "description" -> description,
      "type" -> mediaType, "roles" -> roles)
  }
}

/** The reference's event vocabulary, verbatim (geodb.py:91-117). */
object EventType {
  val Created = "created"
  val DatabaseCreated = "created database"
  val Dropped = "dropped"
  val DatabaseDropped = "dropped database"
  val Renamed = "renamed"
  val Copied = "copied"
  val Moved = "moved"
  val Read = "read"
  val Published = "published"
  val Unpublished = "unpublished"
  val PublishedGs = "published to geoserver"
  val UnpublishedGs = "unpublished from geoserver"
  val RowsAdded = "added rows"
  val RowsDropped = "dropped rows"
  val PropertyAdded = "added property"
  val PropertyDropped = "dropped property"
  val IndexCreated = "created index"
  val IndexDropped = "dropped index"
  val GroupCreated = "added group"
  val GroupDropped = "removed group"
  val GroupAdded = "added to group"
  val GroupRemoved = "removed from group"
  val PublishedGroup = "published to group"
  val UnpublishedGroup = "unpublished from group"
  val PublishedDatabase = "published database to group"
  val UnpublishedDatabase = "unpublished database from group"

  val All: Seq[String] = Seq(Created, DatabaseCreated, Dropped, DatabaseDropped,
    Renamed, Copied, Moved, Read, Published, Unpublished, PublishedGs,
    UnpublishedGs, RowsAdded, RowsDropped, PropertyAdded, PropertyDropped,
    IndexCreated, IndexDropped, GroupCreated, GroupDropped, GroupAdded,
    GroupRemoved, PublishedGroup, UnpublishedGroup, PublishedDatabase,
    UnpublishedDatabase)
}
